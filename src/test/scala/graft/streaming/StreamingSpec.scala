package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

class StreamingSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val eventsDir = {
    // stage the testdata events into a dir the file stream can list
    val d = Files.createTempDirectory("events-stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("streaming windowed counts == batch windowed counts on static input") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
      .writeStream.outputMode("append").format("memory")
      .queryName("win_counts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // watermark: append emits windows closed w.r.t. max(ts)-10min; compare
    // against the batch twin restricted to the same closed windows.
    // (timestamps collected as strings — the parquet ts is NTZ in Spark 4)
    val mx = spark.read.parquet(eventsDir)
      .agg(max(col("ts")).as("max_ts"))
    val streamed = spark.table("win_counts")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    val batch = EventStreams.windowedCountsBatch(spark.read.parquet(eventsDir))
      .crossJoin(mx)
      .filter(col("window_start") + expr("INTERVAL 5 minutes") <=
        col("max_ts") - expr("INTERVAL 10 minutes"))
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(batch.subsetOf(streamed), s"missing windows: ${batch -- streamed}")
  }

  test("streaming incremental dedup drains to EXACTLY the inline near-dup pairs; checkpoint resumes") {
    import graft.pipeline.{Dedup, StreamingDedup}
    // near-dup corpus: (2i, 2i+1) differ by one word — split in 3 files
    def mkText(seed: Int): String =
      (0 until 40).map(k => s"w${(seed * 31 + k * 7) % 97}").mkString(" ")
    val docs = (0 until 18).flatMap { i =>
      val base = mkText(i)
      Seq((i * 2L, base), (i * 2L + 1, base + " extraword"))
    }.toDF("doc_id", "text")
    val docsDir = Files.createTempDirectory("dedup-stream-docs").toString
    val work = Files.createTempDirectory("dedup-stream-work").toString
    def writeFile(lo: Long, hi: Long, name: String): Unit =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$docsDir/$name")
    writeFile(0, 12, "f1"); writeFile(12, 24, "f2")

    val store = new graft.store.SnapshotStore(
      Files.createTempDirectory("dedup-stream-store").toString, spark)
    val n1 = StreamingDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work))
    assert(n1 == 2, "two files ⇒ two micro-batches")

    // late-arriving third file: SAME workDir resumes from the source
    // checkpoint and processes ONLY the new file
    writeFile(24, 36, "f3")
    val n2 = StreamingDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work))
    assert(n2 == 1, "resume must re-process only the unseen file")

    // the drained pair table equals the inline batch pipeline EXACTLY:
    // every cross-batch pair is found when its later endpoint arrives
    val streamed = store.read(StreamingDedup.PairsTable)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inline = Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == inline)
    assert(streamed.nonEmpty)
    // and the accreted band table equals a full rebuild (index invariant)
    val bands = store.read(graft.pipeline.MinHashIndex.BandsTable)
      .select("doc_id", "band", "band_hash")
      .as[(Long, Int, Long)].collect().toSet
    val rebuilt = Dedup.lshBands(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "doc_id", 16, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(bands == rebuilt)

    // crash-replay (foreachBatch is at-least-once): simulate a crash
    // BETWEEN store.commit and the streaming commit-log write by deleting
    // the checkpoint's last commit entry — restart re-delivers that batch
    // with the same batchId, and the manifest-tag high-water mark must
    // make the replay a no-op (no duplicate dd_docs/dd_bands/dd_pairs)
    val docsBefore = store.read(StreamingDedup.DocsTable).count()
    val bandsBefore = store.read(graft.pipeline.MinHashIndex.BandsTable).count()
    val commitsDir = java.nio.file.Paths.get(work, "checkpoint", "commits")
    val lastCommit = Files.list(commitsDir).iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .maxBy(_.getFileName.toString.toLong)
    Files.delete(lastCommit)
    // the local checksum FS keeps a hidden .N.crc sibling — remove it too
    // or the replayed commit-log write fails its rename
    Files.deleteIfExists(
      lastCommit.resolveSibling("." + lastCommit.getFileName.toString + ".crc"))
    val n3 = StreamingDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work))
    assert(n3 == 0, "replayed batch must be skipped by the batch-id tag")
    assert(store.read(StreamingDedup.DocsTable).count() == docsBefore)
    assert(store.read(graft.pipeline.MinHashIndex.BandsTable).count() == bandsBefore)
    val replayedPairs = store.read(StreamingDedup.PairsTable)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(replayedPairs == inline, "pairs unchanged after replay")
  }

  test("streaming dedup compaction cadence: long drains keep the pruned layouts live, results exact") {
    import graft.pipeline.{Dedup, MinHashIndex, StreamingDedup}
    def mkText(seed: Int): String =
      (0 until 40).map(k => s"c${(seed * 29 + k * 11) % 89}").mkString(" ")
    val docs = (0 until 30).flatMap { i =>
      val base = mkText(i)
      Seq((i * 2L, base), (i * 2L + 1, base + " tail"))
    }.toDF("doc_id", "text")
    val docsDir = Files.createTempDirectory("dedup-cadence-docs").toString
    val work = Files.createTempDirectory("dedup-cadence-work").toString
    def writeFile(lo: Long, hi: Long, name: String): Unit =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$docsDir/$name")
    (0 until 5).foreach(k => writeFile(k * 12L, k * 12L + 12, s"f$k"))

    val store = new graft.store.SnapshotStore(
      Files.createTempDirectory("dedup-cadence-store").toString, spark)
    // cadence 2 over 5 batches ⇒ compaction runs after batches 2 and 4
    val n1 = StreamingDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work), compactEveryBatches = 2)
    assert(n1 == 5)
    // both pruned layouts live after the drain (the round-5 machinery is
    // actually INVOKED now, not just available)
    assert(store.prefixInfo(MinHashIndex.BandsTable).isDefined,
      "doc-prefix layout must be live after the cadence compactions")
    assert(store.prefixInfo(MinHashIndex.BandsByBucketTable).isDefined,
      "bucket layout must be live on the mirror after the cadence compactions")
    // and the compacted base carries the bulk of the rows: only the
    // POST-compaction deltas (1 batch here) remain as unpartitioned
    // appends, so the pruned read of a single prefix stays delta-sized
    val all = store.read(MinHashIndex.BandsTable).count()
    val onePrefix = store.readPrefixPruned(MinHashIndex.BandsTable, Seq("00")).get.count()
    assert(onePrefix < all, s"pruned read ($onePrefix) must not rescan the base ($all)")

    // exactness across compactions: drained pairs == inline batch twin
    val streamed = store.read(StreamingDedup.PairsTable)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inline = Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == inline)
    assert(streamed.nonEmpty)

    // resume POST-compaction: a late file on the same workDir processes
    // exactly one batch and the pair table stays exact
    val lateDocs = (30 until 33).flatMap { i =>
      val base = mkText(i)
      Seq((i * 2L, base), (i * 2L + 1, base + " tail"))
    }.toDF("doc_id", "text")
    lateDocs.coalesce(1).write.mode("overwrite").parquet(s"$docsDir/f5")
    val n2 = StreamingDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work), compactEveryBatches = 2)
    assert(n2 == 1, "resume after compaction must process only the new file")
    val allDocs = docs.unionByName(lateDocs)
    val streamed2 = store.read(StreamingDedup.PairsTable)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inline2 = Dedup.minhashNearDups(allDocs, "doc_id", "text", tau = 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed2 == inline2, "post-compaction resume drifted from the inline twin")
  }

  test("flatMapGroupsWithState sessionization emits per-user sessions on timeout") {
    val q = EventStreams.sessionize(
      EventStreams.readEvents(spark, eventsDir).as[Event])
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").trigger(Trigger.ProcessingTime("1 second")).start()
    // first micro-batch buffers state; an empty batch after the 30s
    // processing-time timeout flushes sessions — poke the source dir
    val deadline = System.currentTimeMillis() + 90000
    while (spark.table("sessions").isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(2000)
      // touch: write an empty-but-schema'd parquet to trigger batches
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        EventStreams.eventSchema).write.mode("append").parquet(eventsDir)
    }
    q.stop()
    val sessions = spark.table("sessions")
      .select("user_id", "n_events").as[(Long, Int)].collect()
    assert(sessions.nonEmpty, "no sessions emitted before deadline")
    val expected = spark.read.parquet(eventsDir).filter(col("event_id").isNotNull)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    sessions.foreach { case (u, n) => assert(n.toLong == expected(u)) }
  }

  test("streaming span dedup: census equals rebuild; verdicts exact as-of-ingest") {
    import graft.pipeline.{Dedup, HashFamily, SpanIndex, StreamingSpanDedup}
    val span = (1 to 8).map(i => s"sp$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 $span a3"),                 // span's FIRST occurrence
      (1L, "b1 b2 b3 b4 b5 b6 b7 b8 b9"),
      (10L, s"c1 $span c2"),                   // dupes doc 0 cross-file
      (11L, "b1 b2 b3 b4 b5 b6 b7 b8 x"),      // shares doc 1's window
      (20L, s"$span"),                         // late arrival, 3rd copy
      (21L, "z1 z2 z3")
    ).toDF("doc_id", "text")
    val docsDir = Files.createTempDirectory("span-stream-docs").toString
    val work = Files.createTempDirectory("span-stream-work").toString
    def writeFile(lo: Long, hi: Long, name: String): Unit =
      docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
        .coalesce(1).write.mode("overwrite").parquet(s"$docsDir/$name")
    writeFile(0, 10, "f1"); writeFile(10, 20, "f2")

    val store = new graft.store.SnapshotStore(
      Files.createTempDirectory("span-stream-store").toString, spark)
    val n1 = StreamingSpanDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work))
    assert(n1 == 2)
    writeFile(20, 30, "f3")
    val n2 = StreamingSpanDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text", workDir = Some(work))
    assert(n2 == 1, "resume must re-process only the unseen file")

    // census invariant: accreted partial counts merge to a full rebuild
    val census = store.read(SpanIndex.SpansTable)
      .groupBy("wh").agg(sum("cnt").as("cnt"))
      .as[(Long, Long)].collect().toMap
    val rebuilt = SpanIndex.censusRows(docs, "doc_id", "text", 8,
        HashFamily.XxHash64)
      .select("wh", "cnt").as[(Long, Long)].collect().toMap
    assert(census == rebuilt)

    // verdicts: each batch's rows equal the inline operator over every
    // doc ingested up to AND INCLUDING that batch, restricted to the
    // batch (as-of-ingest semantics) — reconstructed from ingest_batch,
    // so the assertion holds under any file-listing order
    val verdicts = store.read(StreamingSpanDedup.VerdictsTable)
      .as[(Long, Int, Int, String, Long)].collect()
    val byBatch = verdicts.groupBy(_._5).toSeq.sortBy(_._1)
    var seenIds = Set.empty[Long]
    byBatch.foreach { case (b, rows) =>
      val batchIds = rows.map(_._1).toSet
      seenIds ++= batchIds
      val ids = seenIds
      val expected = Dedup.dupSpanRemoval(
          docs.filter(col("doc_id").isin(ids.toSeq: _*)), "doc_id", "text")
        .as[(Long, Int, Int, String)].collect()
        .filter(r => batchIds(r._1)).sortBy(_._1).toSeq
      assert(rows.map(r => (r._1, r._2, r._3, r._4)).sortBy(_._1).toSeq
        == expected, s"batch $b verdicts diverge from as-of-ingest inline")
    }
    // the cross-file duplications were actually flagged
    assert(verdicts.find(_._1 == 10L).exists(_._3 == 8))
    assert(verdicts.find(_._1 == 11L).exists(_._3 == 8))
    assert(verdicts.find(_._1 == 20L).exists(_._3 == 8))
    assert(verdicts.find(_._1 == 0L).exists(_._3 == 0),
      "first occurrence must NOT be flagged at its own ingest time")
  }

  test("streaming span dedup on a SHARED store: first batch takes the inline path") {
    // advice fix (round 7): first-batch detection must check for the
    // census TABLE, not just any snapshot — a store already holding an
    // unrelated pipeline's tables used to route the first span batch to
    // the committed path and throw on the missing dd_spans read
    import graft.pipeline.{Dedup, SpanIndex, StreamingSpanDedup}
    val docs = Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8 a9"),
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 b9")).toDF("doc_id", "text")
    val docsDir = Files.createTempDirectory("span-shared-docs").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$docsDir/f1")
    val store = new graft.store.SnapshotStore(
      Files.createTempDirectory("span-shared-store").toString, spark)
    // unrelated pipeline committed first — snapshot exists, census doesn't
    store.commit(0, overwrite = Map("unrelated" -> docs), append = Map.empty)
    val n = StreamingSpanDedup.run(store, docsDir + "/*", docs.schema,
      "doc_id", "text",
      workDir = Some(Files.createTempDirectory("span-shared-work").toString))
    assert(n == 1)
    val got = store.read(StreamingSpanDedup.VerdictsTable)
      .as[(Long, Int, Int, String, Long)].collect().sortBy(_._1)
      .map(r => (r._1, r._2, r._3, r._4)).toSeq
    val want = Dedup.dupSpanRemoval(docs, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(got == want, "shared-store first batch must equal the inline operator")
    // and the census landed next to the unrelated table
    assert(store.latestSnapshot.exists(s =>
      store.tablesAt(s).contains(SpanIndex.SpansTable)))
  }
}

package graft.pipeline

import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** Structured-Streaming twin of the committed MinHash-LSH dedup — the
  * steady-state shape of a 100-TB ingest: documents ARRIVE in batches,
  * and each micro-batch must discover its near-duplicates against
  * everything already ingested WITHOUT recomputing corpus signatures.
  *
  * `foreachBatch` + `Trigger.AvailableNow` over a file source; each
  * micro-batch advances the SAME [[SnapshotStore]] by ONE atomic commit
  * appending three tables:
  *   - `dd_docs`    — the batch's (id, text) rows (verification corpus);
  *   - `dd_bands`   — the batch's LSH band rows ([[MinHashIndex]]'s
  *     table: per-doc independent, so the accreted table always equals
  *     a full rebuild);
  *   - `dd_pairs`   — exact-Jaccard-verified near-dup pairs TOUCHING
  *     the batch, probed against committed ∪ in-flight bands.
  *
  * Every cross-batch pair is discovered exactly once — when its LATER
  * endpoint arrives — so after the stream drains, `dd_pairs` equals the
  * inline [[Dedup.minhashNearDups]] over the full corpus EXACTLY
  * (StreamingSpec pins set equality). Source progress is checkpointed:
  * a killed stream restarted on the same workDir re-processes only
  * unseen files.
  *
  * Exactly-once across crashes: `foreachBatch` is AT-LEAST-once — a
  * crash between `store.commit` and the streaming commit-log write
  * re-delivers the batch on restart with the SAME `batchId`. Each
  * snapshot commit therefore records the batchId as a manifest tag
  * (scoped to this checkpoint's batch-id sequence), and a re-delivered
  * batch whose id is ≤ the committed high-water mark is skipped — the
  * standard foreachBatch idempotence recipe (StreamingSpec simulates
  * the crash by deleting the checkpoint's last commit-log entry and
  * asserts the replay appends nothing).
  */
object StreamingDedup {

  val DocsTable = "dd_docs"
  val PairsTable = "dd_pairs"

  /** Manifest tag carrying `<checkpoint-key>:<last committed batchId>`.
    * The checkpoint key scopes the monotone-batchId assumption: a fresh
    * checkpoint restarts ids at 0, so its batches must not be skipped
    * against an older sequence's high-water mark.
    */
  val IngestBatchTag = "dd_ingest_batch"

  private def ckptKeyOf(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    d.take(4).map(b => f"$b%02x").mkString
  }

  /** Drain all parquet files under `docsDir` as micro-batches into
    * `store`; returns the number of non-empty batches processed.
    */
  def run(
      store: SnapshotStore, docsDir: String, schema: StructType,
      idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.5,
      workDir: Option[String] = None,
      /** index-maintenance cadence (the crawl loop's `compactEveryRounds`
        * pattern): every K processed batches, rewrite both band tables
        * into their pruned-read layouts ([[MinHashIndex.compactPrefix]]).
        * Without a cadence a long-running ingest accretes unbounded
        * un-partitioned delta dirs — the pruned-read machinery exists but
        * every batch's index-side read degrades back to
        * sum-of-all-deltas. Int.MaxValue disables. */
      compactEveryBatches: Int = 16)(implicit spark: SparkSession): Int = {
    val base = Paths.get(workDir.getOrElse(
      Files.createTempDirectory("dedup-stream").toString))
    Files.createDirectories(base)
    var processed = 0
    val ckptDir = base.resolve("checkpoint").toString
    val ckptKey = ckptKeyOf(ckptDir)
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // replay guard (see object scaladoc): skip batches whose id is
        // already under the committed high-water mark of THIS checkpoint
        val replayed = store.latestTag(IngestBatchTag).exists { v =>
          val sep = v.indexOf(':')
          sep > 0 && v.substring(0, sep) == ckptKey &&
            v.substring(sep + 1).toLong >= batchId
        }
        val batch = batch0.select(col(idCol), col(textCol)).localCheckpoint()
        if (!replayed && batch.count() > 0) {
          val snap = store.latestSnapshot.map(_ + 1).getOrElse(0)
          // first-batch detection checks for THIS pipeline's tables, not
          // just any snapshot (shared-store hazard — advice fix, round 7)
          val hasPrev = store.latestSnapshot.exists(s =>
            store.tablesAt(s).contains(DocsTable))
          // both MinHashIndex layout keys ride along so a streaming-built
          // table accepts the same compactPrefix maintenance
          val delta = MinHashIndex.bandRows(
            batch, idCol, textCol, shingleK, numHashes, bands)
            .localCheckpoint()
          // index side of the cross-batch join: only the band-hash
          // buckets this delta touches (bucket-layout mirror), plus the
          // delta itself for intra-batch pairs — the full committed band
          // table is never rescanned once compactPrefix has run
          val allBands =
            if (hasPrev)
              MinHashIndex.bucketPrunedIndex(store, delta).unionByName(delta)
            else delta
          val allDocs =
            if (hasPrev) store.read(DocsTable).unionByName(batch) else batch
          val cands = Dedup.pairsTouchingBands(delta, allBands, idCol)
          val pairs = Dedup
            .exactJaccard(allDocs, cands, idCol, textCol, shingleK)
            .filter(col("jaccard") >= tau)
            .select(col("id_a"), col("id_b"),
              round(col("jaccard"), 6).as("jaccard"))
          store.commit(snap,
            overwrite = Map.empty,
            append = Map(
              DocsTable -> batch,
              MinHashIndex.BandsTable -> delta,
              MinHashIndex.BandsByBucketTable -> delta,
              PairsTable -> pairs),
            tags = Map(IngestBatchTag -> s"$ckptKey:$batchId"))
          processed += 1
          // cadence maintenance AFTER the batch's atomic commit: the
          // high-water tag rides forward through the compaction
          // snapshots, so a crash anywhere in here still replays
          // idempotently (the batch itself is already durable)
          if (processed % compactEveryBatches == 0)
            MinHashIndex.compactPrefix(store, snap + 1, idCol)
        }
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    processed
  }
}

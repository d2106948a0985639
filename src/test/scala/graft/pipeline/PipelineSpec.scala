package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // near-dup fixture: pairs (2i, 2i+1) differ by one appended word;
  // singles are unrelated random-ish texts
  private def mkText(seed: Int): String =
    (0 until 40).map(k => s"w${(seed * 31 + k * 7) % 97}").mkString(" ")

  lazy val nearDupDocs = (0 until 20).flatMap { i =>
    val base = mkText(i)
    Seq((i * 2L, base), (i * 2L + 1, base + " extraword"))
  }.toDF("doc_id", "text")

  test("exact dedup: identical texts share keeper, distinct don't") {
    val dups = (Seq((1L, "same text here"), (2L, "same text here"),
      (3L, "different")).toDF("doc_id", "text"))
    val r = Dedup.exact(dups, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(r(1L) == ((2L, 1L, false)))
    assert(r(2L) == ((2L, 1L, true)))
    assert(r(3L) == ((1L, 3L, false)))
  }

  test("minhash LSH finds the planted near-dup pairs (high-jaccard recall)") {
    val found = Dedup.minhashNearDups(nearDupDocs, "doc_id", "text", tau = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0 until 20).foreach { i =>
      assert(found.contains((i * 2L, i * 2L + 1)),
        s"planted pair (${i * 2},${i * 2 + 1}) missed by MinHash-LSH")
    }
  }

  test("minhash-LSH jaccard values equal brute-force exact jaccard") {
    val all = nearDupDocs.select(col("doc_id").as("id_a"))
      .crossJoin(nearDupDocs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val brute = Dedup.exactJaccard(nearDupDocs, all, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashNearDups(nearDupDocs, "doc_id", "text", tau = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(brute), "LSH reported a pair brute force rejects")
  }

  test("Md5 family seed bounds are enforced at every entry point") {
    // the documented no-overflow invariant h1 + seed*h2 < 2^55 caps
    // usable seeds at 63; exceeding it must fail LOUDLY at plan-build
    // time, not wrap (or ANSI-error) mid-query and drift from the oracle
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashSignatures(docs, "doc_id", "text",
        numHashes = 65, family = HashFamily.Md5)
    }
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text",
      numHashes = 64, family = HashFamily.Md5)
    intercept[IllegalArgumentException] {
      Dedup.lshBands(sigs, "doc_id", bands = 65, rowsPerBand = 1,
        family = HashFamily.Md5)
    }
    intercept[IllegalArgumentException] {
      HashFamily.Md5.hashPrepared(
        HashFamily.Md5.prepare(lit("x")), lit(64L))
    }
    // the production family is unbounded — same calls plan fine
    Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 65)
  }

  test("hash families share pipeline structure: Md5 recall + verified jaccard") {
    // the Md5 family (the DuckDB-oracle parameterization) must drive
    // the SAME pipeline to the same guarantees as production xxhash64:
    // every planted pair recalled, every reported pair brute-verified,
    // and jaccard values identical to xxhash64's on shared pairs (exact
    // verification is family-independent by construction)
    val md5nd = Dedup.minhashNearDups(nearDupDocs, "doc_id", "text",
      tau = 0.5, family = HashFamily.Md5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    (0 until 20).foreach { i =>
      assert(md5nd.contains((i * 2L, i * 2L + 1)),
        s"planted pair (${i * 2},${i * 2 + 1}) missed under Md5")
    }
    val all = nearDupDocs.select(col("doc_id").as("id_a"))
      .crossJoin(nearDupDocs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val brute = Dedup.exactJaccard(nearDupDocs, all, "doc_id", "text")
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(md5nd.keySet.subsetOf(brute.keySet),
      "Md5 LSH reported a pair brute force rejects")
    md5nd.foreach { case (p, j) =>
      assert(brute(p) == j, s"pair $p jaccard drifted across families")
    }
  }

  /** dd12 semantics on hand-checkable docs: a k-window repeated across
    * (or within) documents removes exactly the covered tokens; unique
    * text and sub-k docs are untouched; both hash families agree (no
    * collisions at this scale, so family choice is invisible).
    */
  test("dupSpanRemoval: planted shared spans removed, unique text kept") {
    val span = (1 to 8).map(i => s"dup$i").mkString(" ") // exactly k=8 tokens
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),       // span mid-doc
      (2L, s"$span tail1 tail2"),                  // span at head
      (3L, "alpha beta gamma delta"),              // unique, < k tokens
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),      // unique, >= k tokens
      (5L, s"$span $span")                         // within-doc repeat only
    ).toDF("doc_id", "text")
    for (fam <- Seq(HashFamily.XxHash64, HashFamily.Md5)) {
      val got = Dedup.dupSpanRemoval(docs, "doc_id", "text", k = 8, family = fam)
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (1L, 12, 8, "alpha beta gamma delta"),
        (2L, 10, 8, "tail1 tail2"),
        (3L, 4, 0, "alpha beta gamma delta"),
        (4L, 10, 0, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
        // doc 5: the base window occurs at positions 0 AND 8 (plus in
        // docs 1/2), so its two occurrences alone cover every token —
        // the whole doc is removed
        (5L, 16, 16, "")), s"family $fam")
    }
  }

  test("dupSpanRemoval is partitioning-independent (layout never leaks into values)") {
    val base = Dedup.dupSpanRemoval(nearDupDocs, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(base.exists(_._3 > 0), "fixture produced no removals — test is vacuous")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val alt = Dedup.dupSpanRemoval(nearDupDocs.repartition(7), "doc_id", "text")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
      assert(alt == base)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("simhash: identical text ⇒ identical hash; near-dup ⇒ small hamming") {
    val sigs = Dedup.simhash(nearDupDocs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val same = (Seq((10L, "alpha beta gamma"), (11L, "alpha beta gamma")))
      .toDF("doc_id", "text")
    val s2 = Dedup.simhash(same, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(s2(10L) == s2(11L))
    (0 until 20).foreach { i =>
      val h = java.lang.Long.bitCount(sigs(i * 2L) ^ sigs(i * 2L + 1))
      assert(h <= 12, s"near-dup pair $i hamming $h too large")
    }
  }

  test("brute-force ANN: perturbed copy is its source's top-1") {
    val base = (0 until 10).map { i =>
      (i.toLong, (0 until 16).map(k => ((i * 17 + k * 3) % 13).toFloat / 13f + 0.1f))
    }
    val copies = base.map { case (id, v) =>
      (id + 100, v.updated(0, v.head + 0.001f))
    }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val top1 = Similarity.bruteForceTopK(df,
      df.filter(col("vec_id") >= 100), "vec_id", "embedding", k = 1)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toMap
    base.foreach { case (id, _) =>
      assert(top1(id + 100) == id, s"copy ${id + 100} top-1 was ${top1(id + 100)}")
    }
  }

  test("LSH ANN scores agree with brute force for returned pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 100)
      .select("query_id", "nn_id", "score").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 6)
      .select("query_id", "nn_id", "score").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, s) =>
      brute.get((a, b)).foreach(bs => assert(math.abs(bs - s) < 1e-9))
    }
  }

  test("IVF with nProbe == nClusters degenerates to EXACT brute force; nProbe<k keeps exact scores") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // full probe = every (query, corpus) pair scored once => identical result
    val full = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 8)
      .select("query_id", "nn_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(full == brute, "full-probe IVF drifted from brute force")
    // partial probe: approximate set, but every returned score is the
    // exact cosine (verified against the k=100 brute-force table)
    val bruteAll = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 100)
      .select("query_id", "nn_id", "score").as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 2)
      .select("query_id", "nn_id", "score").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (a, b, s) =>
      bruteAll.get((a, b)).foreach(bs => assert(math.abs(bs - s) < 1e-9))
    }
    // the probed-cluster heuristic must beat random: top-1 recall vs brute
    val bruteTop1 = brute.filter(_._4 == 1).map(r => r._1 -> r._2).toMap
    val ivfTop1 = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 1,
      nClusters = 8, nProbe = 2)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toMap
    val hits = bruteTop1.count { case (qid, nn) => ivfTop1.get(qid).contains(nn) }
    assert(hits >= 2, s"top-1 recall $hits/5 at nProbe=2 — quantizer broken")
  }

  test("Md5-family IVF: full probe still degenerates to exact brute force") {
    // the oracle parameterization (Md5 init + fixed-point means) must
    // preserve IVF's structural guarantee: with nProbe = nClusters every
    // (query, corpus) pair is scored once regardless of the quantizer,
    // so the result EQUALS brute force — the same contract PipelineSpec
    // pins for the production family
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "nn_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val full = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 8, family = HashFamily.Md5)
      .select("query_id", "nn_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(full == brute, "Md5-family full-probe IVF drifted from brute force")
  }

  test("COMMITTED IVF index: probe ≡ fresh ivfTopK; incremental append ≡ assignment against frozen centroids") {
    import graft.store.SnapshotStore
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double, Int)] =
      df.select("query_id", "nn_id", "score", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

    // committed ≡ rebuilt: probe over the snapshot tables is IDENTICAL
    // to the inline build-per-call twin
    val store = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("ivf").toString, spark)
    IvfIndex.build(store, 0, e, "vec_id", "embedding", nClusters = 8)
    val committed = rows(IvfIndex.probe(store, q, "vec_id", "embedding", k = 5, nProbe = 2))
    val fresh = rows(Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
      nClusters = 8, nProbe = 2))
    assert(committed == fresh, "committed-index probe drifted from fresh build")

    // incremental append: build on part A, append part B ⇒ index holds
    // exactly assignToCentroids(A ∪ B, centroids(A)); probes agree
    val a = e.filter(col("vec_id") % 2 === 0)
    val b = e.filter(col("vec_id") % 2 === 1)
    val store2 = new SnapshotStore(
      java.nio.file.Files.createTempDirectory("ivf2").toString, spark)
    IvfIndex.build(store2, 0, a, "vec_id", "embedding", nClusters = 8)
    IvfIndex.append(store2, 1, b, "vec_id", "embedding")
    val centsA = store2.read(IvfIndex.CentroidsTable)
    val wantIndex = Similarity.assignToCentroids(e, centsA, "vec_id", "embedding")
      .as[(Long, Seq[Float], Int)].collect().toSet
    val gotIndex = store2.read(IvfIndex.IndexTable)
      .as[(Long, Seq[Float], Int)].collect().toSet
    assert(gotIndex == wantIndex, "incremental index ≠ full assignment against frozen centroids")
    val gotProbe = rows(IvfIndex.probe(store2, q, "vec_id", "embedding", k = 5, nProbe = 2))
    val wantProbe = rows(Similarity.probeIndex(
      Similarity.assignToCentroids(e, centsA, "vec_id", "embedding"), centsA,
      q, "vec_id", "embedding", k = 5, nProbe = 2))
    assert(gotProbe == wantProbe)

    // cluster-partitioned compaction: the probe read must engage the
    // pruned path AND results must be unchanged
    IvfIndex.compact(store2, 2, buckets = 4)
    assert(store2.prefixInfo(IvfIndex.IndexTable)
      .contains(("cluster_id", IvfIndex.ClusterKeyLen)),
      "cluster layout must be live after compact")
    val prunedProbe = rows(IvfIndex.probe(store2, q, "vec_id", "embedding", k = 5, nProbe = 2))
    assert(prunedProbe == gotProbe, "cluster-pruned probe changed results")
    // ...and the read really prunes: a single query probes ≤2 of the 8
    // clusters, so its pruned read covers strictly fewer rows than the
    // full index
    val q1 = e.filter(col("vec_id") === 0)
    val probedIds = Similarity
      .probeAssignments(centsA, q1, "vec_id", "embedding", nProbe = 2)
      .select("cluster_id").distinct().as[Int].collect().map(_.toString).toSeq
    val prunedRows = store2.readPrefixPruned(IvfIndex.IndexTable, probedIds).get.count()
    assert(prunedRows < store2.read(IvfIndex.IndexTable).count(),
      s"pruned read ($prunedRows rows) did not reduce the scan")

    // post-compaction append: deltas are read un-pruned in full, so the
    // probe must still equal the inline twin over the union
    val extra = e.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    IvfIndex.append(store2, 3, extra, "vec_id", "embedding")
    val gotProbe2 = rows(IvfIndex.probe(store2, q, "vec_id", "embedding", k = 5, nProbe = 2))
    val wantProbe2 = rows(Similarity.probeIndex(
      Similarity.assignToCentroids(
        e.select("vec_id", "embedding").unionByName(extra), centsA, "vec_id", "embedding"),
      centsA, q, "vec_id", "embedding", k = 5, nProbe = 2))
    assert(gotProbe2 == wantProbe2, "post-compaction append broke the pruned probe")
  }

  test("quantizeInt8: hand-computed codes, constant-vector zero branch") {
    val vecs = Seq(
      (1L, Seq(0f, 0.5f, 1f)),        // mn 0, mx 1, scale 1/255 -> 0,128,255
      (2L, Seq(2f, 2f, 2f)),          // constant -> all-zero codes
      (3L, Seq(-1f, 1f))              // mn -1, mx 1 -> 0, 255
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .as[(Long, Double, Double, Seq[Int])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0.0, 1.0, Seq(0, 128, 255)),   // floor(0.5*255 + 0.5) = 128
      (2L, 2.0, 2.0, Seq(0, 0, 0)),
      (3L, -1.0, 1.0, Seq(0, 255))))
  }

  test("semDeDup: one keeper per duplicate vector group, dup_of points at the min id") {
    val e0 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // plant exact duplicates: ids 10000+k carry vector of id k (k<4)
    val dups = e0.filter(col("vec_id") < 4)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val e = e0.unionByName(dups)
    val r = Similarity.semDeDup(e, "vec_id", "embedding", nClusters = 4, tau = 0.999999)
      .collect().map(x => x.getLong(0) ->
        ((x.getInt(1), if (x.isNullAt(2)) -1L else x.getLong(2), x.getBoolean(3)))).toMap
    assert(r.size == e.count())
    (0L until 4L).foreach { k =>
      assert(r(k)._3, s"original $k must be kept")
      val (ck, dupOf, kept) = r(k + 10000)
      assert(!kept && dupOf == k, s"planted copy of $k: got $dupOf kept=$kept")
      assert(ck == r(k)._1, "identical vectors must share a cluster")
    }
  }

  test("MinHashIndex: committed build+append ≡ inline bands; nearDups ≡ inline; delta pairs = touching subset") {
    val store = new graft.store.SnapshotStore(
      java.nio.file.Files.createTempDirectory("mh-index").toString, spark)
    val a = nearDupDocs.filter(col("doc_id") < 20)
    val b = nearDupDocs.filter(col("doc_id") >= 20)
    MinHashIndex.build(store, 0, a, "doc_id", "text")
    MinHashIndex.append(store, 1, b, "doc_id", "text")

    // band rows are per-doc independent ⇒ EXACT set equality with one
    // inline pass over the union
    val committed = store.read(MinHashIndex.BandsTable)
      .select("doc_id", "band", "band_hash")
      .as[(Long, Int, Long)].collect().toSet
    val inline = Dedup.lshBands(
      Dedup.minhashSignatures(nearDupDocs, "doc_id", "text"), "doc_id", 16, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(committed == inline)

    // the band-hash-bucketed mirror carries the SAME rows (dual append)
    val mirrored = store.read(MinHashIndex.BandsByBucketTable)
      .select("doc_id", "band", "band_hash")
      .as[(Long, Int, Long)].collect().toSet
    assert(mirrored == committed, "bucket-layout mirror drifted from dd_bands")

    // time travel: snapshot 0 still reads exactly build(A)'s bands
    val at0 = store.readAt(MinHashIndex.BandsTable, 0)
      .select("doc_id", "band", "band_hash")
      .as[(Long, Int, Long)].collect().toSet
    val inlineA = Dedup.lshBands(
      Dedup.minhashSignatures(a, "doc_id", "text"), "doc_id", 16, 4)
      .as[(Long, Int, Long)].collect().toSet
    assert(at0 == inlineA, "pre-append snapshot must time-travel intact")

    val nd = MinHashIndex.nearDups(store, nearDupDocs, "doc_id", "text", tau = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inlineNd = Dedup.minhashNearDups(nearDupDocs, "doc_id", "text", tau = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(nd == inlineNd, "committed-index near-dups must equal the inline pipeline")

    // the per-batch query returns exactly the full pairs touching the delta
    val bIds = b.select("doc_id").as[Long].collect().toSet
    val full = MinHashIndex.candidatePairs(store, "doc_id")
      .as[(Long, Long)].collect().toSet
    val delta = MinHashIndex.candidatePairsFor(store, b.select("doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(delta == full.filter(p => bIds(p._1) || bIds(p._2)))
    assert(delta.nonEmpty)

    // prefix compaction: the pruned probe-side read must engage AND the
    // delta/nearDup results must be unchanged; a post-compaction append
    // (read un-pruned in full) must stay correct too
    MinHashIndex.compactPrefix(store, 2, "doc_id", buckets = 4)
    assert(store.readPrefixPruned(MinHashIndex.BandsTable, Seq("00")).isDefined,
      "prefix layout must be live after compactPrefix")
    assert(store.prefixInfo(MinHashIndex.BandsByBucketTable)
      .contains(("bpfx", MinHashIndex.PrefixLen)),
      "bucket layout must be live on the mirror after compactPrefix")
    val deltaPruned = MinHashIndex
      .candidatePairsFor(store, b.select("doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(deltaPruned == delta, "pruned probe path changed the pair set")
    // index-side pruning really reduces the scan: a ONE-row probe
    // touches 1 of the 256 band-hash buckets, so its bucket-pruned index
    // read covers strictly fewer rows than the full band table
    val oneBand = store.read(MinHashIndex.BandsTable).limit(1).localCheckpoint()
    assert(MinHashIndex.bucketPrunedIndex(store, oneBand).count() <
      store.read(MinHashIndex.BandsTable).count(),
      "bucket-pruned index read did not reduce the scan")
    val ndAfter = MinHashIndex.nearDups(store, nearDupDocs, "doc_id", "text", tau = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(ndAfter == inlineNd)
    val extra = nearDupDocs.filter(col("doc_id") < 2)
      .select(col("doc_id") + 1000 as "doc_id", col("text"))
    MinHashIndex.append(store, 4, extra, "doc_id", "text")
    val deltaExtra = MinHashIndex
      .candidatePairsFor(store, extra.select("doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    // each copied doc must pair with its source (identical text)
    assert(deltaExtra.contains((0L, 1000L)) && deltaExtra.contains((1L, 1001L)),
      s"post-compaction append missed copy pairs: $deltaExtra")
  }

  test("connectedComponents: 64-node path graph collapses to one component") {
    // diameter-64 chain — the worst case for naive min-propagation
    // (O(diameter) rounds); large-star/small-star must converge in
    // O(log²) phases under the default cap
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(cc.keySet == (0L to 63L).toSet)
    assert(cc.values.toSet == Set(0L), "every node must label to the min id 0")
  }

  test("connectedComponents ≡ local union-find on a pseudo-random graph") {
    // deterministic edge soup: 220 nodes, ~160 edges incl. parallel
    // edges, self-loops and reversed duplicates
    val edges = (0 until 160).map { k =>
      val a = (k * 7919 + 13) % 220
      val b = (k * 104729 + k * k * 31 + 7) % 220
      (a.toLong, b.toLong)
    }
    val cc = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

    // reference union-find with path compression
    val parent = Array.tabulate(220)(identity)
    def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .filter(id => edges.exists(e => e._1 != e._2 && (e._1 == id || e._2 == id)))
    expected.foreach { id =>
      // the component min stays a union-find root forever (nothing
      // smaller exists to absorb it), so find() lands on it
      val root = find(id.toInt)
      assert(cc(id) == root.toLong, s"node $id: cc=${cc.get(id)} uf=$root")
    }
  }

  test("connectedComponents/dupClusters: empty pair list ⇒ all singletons") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(noPairs).count() == 0)
    val r = Dedup.dupClusters((1L to 3L).toDF("doc_id"), "doc_id", noPairs)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(r == Set((1L, 1L, 1L, true), (2L, 2L, 1L, true), (3L, 3L, 1L, true)))
  }

  test("dupClusters: transitivity, singletons, string ids, keeper = component min") {
    val ids = Seq("a", "b", "c", "d", "e", "f").toDF("doc_id")
    val pairs = Seq(("b", "a"), ("b", "c"), ("f", "e")).toDF("id_a", "id_b")
    val r = Dedup.dupClusters(ids, "doc_id", pairs)
      .as[(String, String, Long, Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r("a") == (("a", 3L, true)))
    assert(r("b") == (("a", 3L, false)), "a~b, b~c ⇒ b labels to a transitively")
    assert(r("c") == (("a", 3L, false)))
    assert(r("d") == (("d", 1L, true)), "unpaired id is its own singleton keeper")
    assert(r("e") == (("e", 2L, true)))
    assert(r("f") == (("e", 2L, false)))
  }

  test("c4Filter verdicts: duplicate / too_short / kept, first-failing reason order") {
    val good = ("the cat and the dog sat on the mat in the sun and it is warm " * 4).trim
    val docs = Seq(
      (1L, good), (2L, good),                  // 2 loses to 1 as duplicate
      (3L, "tiny doc"),                        // too_short
      (4L, good + " extra")                    // kept (en, long enough, quality ok)
    ).toDF("doc_id", "text")
    val r = Curation.c4Filter(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getString(5), x.getBoolean(6)))).toMap
    assert(r(1L)._2, s"doc 1 should be kept: ${r(1L)}")
    assert(r(2L) == (("duplicate", false)))
    assert(r(3L) == (("too_short", false)))
    assert(r(4L)._2)
  }

  test("sampleStratified is deterministic and kept == key < threshold") {
    val docs = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val s1 = Curation.sampleStratified(docs, "doc_id", "lang", Map("en" -> 0.5), 0.25)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getBoolean(4)))
    val s2 = Curation.sampleStratified(docs, "doc_id", "lang", Map("en" -> 0.5), 0.25)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(s1.toSeq == s2.toSeq)
    s1.foreach { case (_, key, thr, kept) => assert(kept == (key < thr)) }
    // rates land near the targets (hash uniformity, generous bounds)
    val en = s1.filter(_._3 == "8000"); val de = s1.filter(_._3 == "4000")
    assert(math.abs(en.count(_._4).toDouble / en.length - 0.5) < 0.15)
    assert(math.abs(de.count(_._4).toDouble / de.length - 0.25) < 0.15)
  }

  test("packSequences: per-stratum id-ordered prefix sums land in budget bins") {
    val docs = (0L until 30L).map(i => (i, "s", ("w " * (10 + (i % 7).toInt)).trim))
      .toDF("doc_id", "lang", "text")
    val r = Curation.packSequences(docs, "doc_id", "text", "lang", budgetTokens = 40)
      .collect().map(x => (x.getLong(0), x.getInt(2), x.getLong(3), x.getLong(4)))
      .sortBy(_._1)
    var cum = 0L
    r.foreach { case (_, n, got, pack) =>
      assert(got == cum + n)                   // inclusive prefix sum
      assert(pack == cum / 40)                 // exclusive-sum bin
      cum += n
    }
    assert(r.map(_._4).distinct.length > 1)    // actually splits into packs
  }

  test("qualityPercentile: per-stratum top-fraction gate, percentiles in (0,1]") {
    val docs = (0L until 100L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      // varying lengths → spread of quality scores
      (i, lang, ("the and of to in is word " * (1 + (i % 10).toInt)).trim)
    }.toDF("doc_id", "lang", "text")
    val r = Curation.qualityPercentile(docs, "doc_id", "text", "lang", topFraction = 0.4)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(3), x.getBoolean(4)))
    assert(r.forall { case (_, _, p, _) => p > 0.0 && p <= 1.0 })
    // per stratum, kept ≈ top 40% (ties can widen/narrow the set slightly)
    Seq("en", "de").foreach { l =>
      val in = r.filter(_._2 == l)
      val kept = in.count(_._4)
      assert(kept > 0 && kept < in.length)
      // every kept doc's percentile exceeds every dropped doc's
      val minKept = in.filter(_._4).map(_._3).min
      val maxDrop = in.filterNot(_._4).map(_._3).max
      assert(minKept > maxDrop || minKept == maxDrop)
    }
  }

  test("qualityThresholdApprox (scale twin): agrees with the exact gate off the boundary") {
    val docs = (0L until 100L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      (i, lang, ("the and of to in is word " * (1 + (i % 10).toInt)).trim)
    }.toDF("doc_id", "lang", "text")
    val exact = Curation.qualityPercentile(docs, "doc_id", "text", "lang", 0.4)
      .collect().map(x => x.getLong(0) -> ((x.getDouble(2), x.getBoolean(4)))).toMap
    val approx = Curation.qualityThresholdApprox(docs, "doc_id", "text", "lang", 0.4)
      .collect().map(x => x.getLong(1) -> ((x.getDouble(2), x.getDouble(3), x.getBoolean(4)))).toMap
    assert(approx.size == exact.size)
    approx.foreach { case (id, (q, thr, keptA)) =>
      val (qe, keptE) = exact(id)
      assert(q == qe)
      // any disagreement must sit exactly ON the threshold (tie semantics)
      if (keptA != keptE) assert(q == thr, s"doc $id disagrees off-boundary: q=$q thr=$thr")
    }
    assert(approx.values.exists(_._3) && approx.values.exists(!_._3))
  }

  test("contamination: verbatim eval copy scores 1.0, unrelated text low") {
    val evalText = mkText(500)
    val docs = Seq(
      (0L, evalText),                // doc_id % 97 == 0 -> eval member
      (5L, evalText),                // verbatim copy -> containment 1.0
      (6L, mkText(777))              // unrelated
    ).toDF("doc_id", "text")
    val r = Curation.contamination(docs, "doc_id", "text",
      isEval = col("doc_id") % 97 === 0).collect()
      .map(x => x.getLong(0) -> ((x.getDouble(3), x.getBoolean(4)))).toMap
    assert(!r.contains(0L))          // eval docs excluded from the output
    assert(r(5L) == ((1.0, true)))
    assert(r(6L)._1 < 0.5 && !r(6L)._2)
  }

  test("token stats values") {
    val df = Seq((1L, "Hello, world! 42"), (2L, "  spaced   out  ")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getInt(3)))).toMap
    assert(r(1L) == ((16, 3, 5))) // hello , world ! 42
    assert(r(2L)._2 == 2)
  }

  test("repetitionSignals: hand-computed fractions incl. short/empty docs") {
    val df = Seq(
      (1L, "a b a b c"),       // dup1 4/5, top2 "a b"=2/4, top3 1/3, dup5 0/1
      (2L, "x"),               // no 2/3/5-grams at all
      (3L, ""),                // no tokens — every left join misses
      (4L, "z z z z z z")      // total repetition: everything 1.0
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r(1L) == ((0.5, 0.333333, 0.8, 0.0)))
    assert(r(2L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(r(3L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(r(4L) == ((1.0, 1.0, 1.0, 1.0)))
  }

  test("ngramCounts: hand-computed cf/df across n, minCount floor") {
    val docs = Seq(
      (1L, "a b a b"),   // 1-grams: a×2 b×2; 2-grams: "a b"×2, "b a"×1
      (2L, "a b c")      // 1-grams: a b c; 2-grams: "a b", "b c"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramCounts(docs, "doc_id", "text",
        maxN = 2, minCount = 2)
      .as[(Int, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1, "a", 3L, 2L), (1, "b", 3L, 2L),          // c dropped (cf=1)
      (2, "a b", 3L, 2L)))                          // "b a"/"b c" dropped
  }

  test("tfidfTopTerms: hand-computed linear-idf scores, token tie-break") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry dog")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    // N=3; df: apple 1, banana 2, cherry 2, dog 1
    assert(got == Seq(
      (1L, 1, "apple", 2L, 1L, 6.0),   // 2 * 3/1
      (1L, 2, "banana", 1L, 2L, 1.5),  // 1 * 3/2
      (2L, 1, "banana", 1L, 2L, 1.5),  // tie with cherry -> token asc
      (2L, 2, "cherry", 1L, 2L, 1.5),
      (3L, 1, "cherry", 3L, 2L, 4.5),
      (3L, 2, "dog", 1L, 1L, 3.0)))
  }

  test("vocabTopK: cf ordering, token tie-break, df alongside") {
    val df = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.vocabTopK(df, "doc_id", "text", k = 2)
      .as[(String, Long, Long)].collect()
    assert(top.toSeq == Seq(("apple", 2L, 1L), ("banana", 2L, 2L)),
      "cf desc then token asc; cherry (cf=1) must miss the k=2 cut")
  }

  test("piiScan: planted PII counted and redacted, clean text untouched") {
    val dirty = "mail john.doe@example.com or admin@test.org, " +
      "host 10.0.0.1 port 80, ssn 123-45-6789 end"
    val clean = "no personal data in this row at all"
    val df = Seq((1L, dirty), (2L, clean)).toDF("doc_id", "text")
    val r = Curation.piiScan(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(1), x.getInt(2), x.getInt(3), x.getString(4), x.getBoolean(5)))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val redacted = "mail <EMAIL> or <EMAIL>, host <IPV4> port 80, ssn <SSN> end"
    assert(r(1L) == ((2, 1, 1, md5hex(redacted), true)))
    assert(r(2L) == ((0, 0, 0, md5hex(clean), false)))
  }

  test("shuffleDeterministic: replayable under repartitioning, dense per-shard pos") {
    val docs = (0L until 200L).map(d => (d, s"t$d")).toDF("doc_id", "text")
    val a = Curation.shuffleDeterministic(docs, "doc_id", "epoch0")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Curation.shuffleDeterministic(docs.repartition(7), "doc_id", "epoch0")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b, "shuffle assignment must not depend on input partitioning")

    val rows = Curation.shuffleDeterministic(docs, "doc_id", "epoch0")
      .select("shard", "pos").as[(Int, Int)].collect()
    val byShard = rows.groupBy(_._1)
    assert(byShard.keySet.subsetOf((0 until 16).toSet))
    assert(byShard.size > 4, "200 md5 keys must scatter over many shards")
    byShard.foreach { case (sh, ps) =>
      assert(ps.map(_._2).sorted.toSeq == (1 to ps.length).toSeq,
        s"shard $sh pos must be dense 1..${ps.length}")
    }
    // a different seed reshuffles
    val c = Curation.shuffleDeterministic(docs, "doc_id", "epoch1")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a != c, "seed must change the assignment")
  }

  /** SpanIndex lifecycle: every batch flagged BEFORE its append must
    * equal the inline dupSpanRemoval over everything ingested so far
    * (restricted to the batch) — including cross-batch duplicated spans
    * that only the committed census can see; compaction must not change
    * results, and post-compaction appends must still count.
    */
  test("SpanIndex: incremental flag+append ≡ inline over the union; survives compaction") {
    val span = (1 to 8).map(i => s"s$i").mkString(" ")
    val b1 = Seq((1L, s"one two $span three"), (2L, "u1 u2 u3 u4 u5 u6 u7 u8 u9"))
      .toDF("doc_id", "text")
    val b2 = Seq((10L, s"head $span tail"), (11L, "v1 v2 v3 v4 v5 v6 v7 v8"))
      .toDF("doc_id", "text")
    val b3 = Seq((20L, "u1 u2 u3 u4 u5 u6 u7 u8 zz"), (21L, "w1 w2"))
      .toDF("doc_id", "text")
    val store = new graft.store.SnapshotStore(
      java.nio.file.Files.createTempDirectory("span-idx").toString, spark)
    def inlineFor(batch: org.apache.spark.sql.DataFrame, all: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Int, String)] = {
      val ids = batch.select("doc_id").as[Long].collect().toSet
      Dedup.dupSpanRemoval(all, "doc_id", "text")
        .as[(Long, Int, Int, String)].collect().filter(r => ids(r._1))
        .sortBy(_._1).toSeq
    }
    def committedFor(batch: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Int, String)] =
      SpanIndex.dupSpanRemovalFor(store, batch, "doc_id", "text")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq

    SpanIndex.build(store, 0, b1, "doc_id", "text")
    // batch 2: doc 10 shares the span with committed doc 1 — a
    // cross-batch duplicate only the census can flag
    val got2 = committedFor(b2)
    assert(got2 == inlineFor(b2, b1.unionAll(b2)))
    assert(got2.exists(_._3 > 0), "cross-batch span not flagged")
    SpanIndex.append(store, 1, b2, "doc_id", "text")
    // compaction rewrites the census into the prefix layout
    SpanIndex.compactPrefix(store, 2)
    // batch 3 post-compaction: doc 20 duplicates doc 2's window
    val got3 = committedFor(b3)
    assert(got3 == inlineFor(b3, b1.unionAll(b2).unionAll(b3)))
    assert(got3.exists(_._3 > 0), "post-compaction span not flagged")
    // and a re-query of batch 2 AFTER its own append now sees its rows
    // twice (append-first is the documented double-count hazard) —
    // assert the contract note is real: doc 11's unique text is now
    // "duplicated" by its own committed counts
    val requery2 = committedFor(b2)
    assert(requery2.find(_._1 == 11L).exists(_._3 > 0),
      "ingest-order contract: append-first must double-count")
  }

  test("spanDecontaminate: eval-shared spans excised, train-only repeats kept") {
    val span = (1 to 8).map(i => s"ev$i").mkString(" ")
    val train = Seq(
      (1L, s"keep1 keep2 $span keep3"),      // eval span mid-doc → excised
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),    // no eval overlap → untouched
      (3L, s"$span"),                        // doc IS the eval span
      (4L, "short doc"),                     // < k tokens → untouched
      (5L, "t1 t2 t3 t4 t5 t6 t7 t8")        // repeats doc 2's window —
                                             // train-internal, NOT excised
                                             // (that's dd12's job)
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, s"prefix $span suffix")).toDF("doc_id", "text")
    for (fam <- Seq(HashFamily.XxHash64, HashFamily.Md5)) {
      val got = Curation.spanDecontaminate(train, eval_, "doc_id", "text",
          k = 8, family = fam)
        .as[(Long, Int, Int, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq(
        (1L, 11, 8, "keep1 keep2 keep3"),
        (2L, 9, 0, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),
        (3L, 8, 8, ""),
        (4L, 2, 0, "short doc"),
        (5L, 8, 0, "t1 t2 t3 t4 t5 t6 t7 t8")), s"family $fam")
    }
  }

  test("sourceOverlapMatrix: hand-computed pair, zero-overlap pairs absent") {
    val docs = Seq(
      (1L, "s1", "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "s2", "b c d e"),   // shingles: "b c d", "c d e"
      (3L, "s3", "x y z")      // shingle : "x y z"
    ).toDF("doc_id", "source", "text")
    val got = Curation.sourceOverlapMatrix(docs, "source", "text", shingleK = 3)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    assert(got == Seq(("s1", "s2", 1L, 2L, 2L, 0.333333, 0.5, 0.5)))
  }

  test("mixtureTable: per-stratum masses and global fractions") {
    val df = Seq(
      (1L, "a b", "en", "s1"), (2L, "c", "en", "s1"), (3L, "d e f", "fr", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val r = Curation.mixtureTable(df, "text", Seq("lang", "source"))
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6, x._7))).toMap
    assert(r(("en", "s1")) == ((2L, 3L, 4L, 0.666667, 0.5)))
    assert(r(("fr", "s2")) == ((1L, 3L, 5L, 0.333333, 0.5)))
  }

  test("readability: hand-computed counts and score; guards on degenerate text") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),  // 6 words, 2 sentences, 6 vowel groups
      (2L, "")                            // all guards floor to 1
    ).toDF("doc_id", "text")
    val r = TextAnalysis.readability(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2), x.getInt(3), x.getDouble(4)))).toMap
    assert(r(1L)._1 == 6 && r(1L)._2 == 2 && r(1L)._3 == 6)
    val expected1 = BigDecimal(206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L)._4 == expected1)
    assert(r(2L) == ((1, 1, 1,
      BigDecimal(206.835 - 1.015 - 84.6).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("langId picks the language whose markers dominate") {
    val df = Seq(
      (1L, "le chat est sur la table et le chien est dans les champs"),
      (2L, "der hund ist ein tier und die katze ist das beste"),
      (3L, "the cat is on the table and the dog is in the yard"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(r(1L) == "fr" && r(2L) == "de" && r(3L) == "en")
  }

  test("winnowing fingerprint robust to a small edit") {
    val a = mkText(7)
    val b = a.replace("w8 ", "w8 inserted ")
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowingFingerprint(df, "doc_id", "text")
      .select("doc_id", "fingerprint").as[(Long, Seq[Long])].collect().toMap
    val inter = fps(1L).toSet.intersect(fps(2L).toSet).size.toDouble
    val overlap = inter / math.max(fps(1L).size, fps(2L).size)
    assert(overlap >= 0.5, s"winnowing overlap $overlap too low after 1-word edit")
    // the Md5 family keeps the same robustness property (ta04's
    // hard-oracle parameterization shares the pipeline, not just shape)
    val fpsMd5 = TextAnalysis.winnowingFingerprint(df, "doc_id", "text",
        family = HashFamily.Md5)
      .select("doc_id", "fingerprint").as[(Long, Seq[Long])].collect().toMap
    val interM = fpsMd5(1L).toSet.intersect(fpsMd5(2L).toSet).size.toDouble
    val overlapM = interM / math.max(fpsMd5(1L).size, fpsMd5(2L).size)
    assert(overlapM >= 0.5, s"Md5 winnowing overlap $overlapM too low")
  }

  test("multimodal features deterministic under repartitioning + batch shape real") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media.repartition(1), batchSize = 16)
      .select("media_id", "payload_md5", "feature").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Float](2))).toMap
    val f7 = Multimodal.extractFeatures(media.repartition(7), batchSize = 16)
      .select("media_id", "payload_md5", "feature").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[Float](2))).toMap
    assert(f1 == f7)
    assert(f1.values.forall(_._2.length == 8))
    val batches = Multimodal.extractFeatures(media.repartition(2), batchSize = 16)
      .select("batch_size").as[Int].collect()
    assert(batches.forall(_ <= 16) && batches.max == 16)
  }

  /** Measured-recall floors (round-6): the hard oracles pin WHAT the
    * approximations compute; these pin HOW CLOSE they land to the exact
    * answer, so a knob/hash-family regression that silently craters
    * quality fails the suite while staying "correct". Floors sit under
    * the sf0.001 measured values (lsh 8-table 0.366, ivf 0.50, minhash
    * 1.00 — BENCH/BASELINE.md round-6 recall table) with slack for
    * testdata regeneration.
    */
  test("recall floors: multi-table LSH, IVF and MinHash vs exact twins") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .localCheckpoint()
    val single = Recall.topKRecall(
      Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 6), brute)
    val multi = Recall.topKRecall(
      Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 6,
        nTables = 8), brute)
    assert(multi > single,
      s"multi-table LSH recall ($multi) must beat single-table ($single)")
    assert(multi >= 0.25, s"8-table LSH recall@5 regressed: $multi (floor 0.25)")
    val ivf = Recall.topKRecall(
      Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5), brute)
    assert(ivf >= 0.40, s"IVF nProbe=2/8 recall@5 regressed: $ivf (floor 0.40)")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val truth = Recall.exactNearDupPairs(docs, "doc_id", "text", tau = 0.5)
      .localCheckpoint()
    val mh = Recall.pairRecall(
      Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.5), truth)
    assert(mh >= 0.96, s"MinHash pair recall vs exact Jaccard regressed: $mh (floor 0.96)")
  }
}

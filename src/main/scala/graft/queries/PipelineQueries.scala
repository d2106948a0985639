package graft.queries

import graft.pipeline.{Curation, Dedup, HashFamily, MinHashIndex, Multimodal, Similarity, SpanIndex, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` / `embeddings`
  * tables: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), ANN similarity search, text analysis, multimodal
  * plumbing. SQL-expressible ones have DuckDB oracles; signature-based
  * ones (xxhash64 seeds) are rows-only + ScalaTest-verified.
  */
object PipelineQueries {

  /** THE documents source every pipeline query reads — public so Bench's
    * production-family series measures the same input as the `queries`
    * entries (a diverging bench-side read would silently measure a
    * different scan if this ever gains a filter/projection).
    */
  def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def embs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup groups (oracle: md5 + count window)
    "dd01_exact_dups" -> ((s, d) => {
      Dedup.exact(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // MinHash signature prefix — FULL oracle via the injectable
    // Md5 hash family (seeded md5, DuckDB-recomputable; production
    // default stays xxhash64 — PipelineSpec pins both families share
    // pipeline structure). Emitted as a comma-joined STRING: the
    // driver's comparator hashes column values and cannot hash arrays.
    "dd02_minhash_signature" -> ((s, d) => {
      Dedup.minhashSignatures(docs(s, d), "doc_id", "text",
          family = HashFamily.Md5)
        .select(col("doc_id"),
          array_join(transform(slice(col("minhash"), 1, 4),
            x => x.cast("string")), ",").as("sig_prefix"))
        .orderBy(col("doc_id"))
    }),

    // MinHash+LSH near-dup pairs w/ exact-Jaccard verification — FULL
    // oracle (Md5 family: DuckDB twins signatures → bands →
    // candidate join → exact Jaccard value-for-value)
    "dd03_minhash_lsh_pairs" -> ((s, d) => {
      Dedup.minhashNearDups(docs(s, d), "doc_id", "text", tau = 0.3,
          family = HashFamily.Md5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // SimHash near-dup pairs, hamming <= 8 — FULL oracle (Md5 family:
    // DuckDB recomputes the 64 bit votes, packed signature, chunk
    // blocking and Hamming verification value-for-value)
    "dd04_simhash_pairs" -> ((s, d) => {
      Dedup.simhashNearDups(docs(s, d), "doc_id", "text", maxHamming = 8,
          family = HashFamily.Md5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // exact 3-gram Jaccard on (lang, source)-blocked pairs — FULL oracle
    "dd05_ngram_jaccard" -> ((s, d) => {
      val dd = docs(s, d)
      val blockPairs = dd.select(col("doc_id").as("id_a"),
          col("lang"), col("source"))
        .join(dd.select(col("doc_id").as("id_b"), col("lang"), col("source")),
          Seq("lang", "source"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      Dedup.exactJaccard(docs(s, d), blockPairs, "doc_id", "text", shingleK = 3)
        .filter(col("jaccard") >= 0.03)
        .select(col("id_a"), col("id_b"), col("i"), col("sz_a"), col("sz_b"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // duplicate-span removal (exact-substring dedup, window-hash
    // formulation — Lee et al. 2022) — FULL oracle (Md5 family: the
    // seed-0 window hash is the md5 h1 half, recomputed by DuckDB
    // value-for-value; production default stays xxhash64)
    "dd12_dup_span_removal" -> ((s, d) => {
      Dedup.dupSpanRemoval(docs(s, d), "doc_id", "text", k = 8,
          family = HashFamily.Md5)
        .orderBy(col("doc_id"))
    }),

    // committed span-census index: build on 3/4 of the corpus, flag the
    // remaining 1/4 as an incoming batch BEFORE appending it (the ingest
    // order) — output must equal the inline dd12 over the WHOLE corpus
    // restricted to the batch, which is exactly what the oracle
    // recomputes (dd12's SQL + the batch filter) — FULL oracle
    "dd13_span_committed" -> ((s, d) => {
      val dd = docs(s, d)
      val store = new graft.store.SnapshotStore(
        java.nio.file.Files.createTempDirectory("dd-spans").toString, s)
      SpanIndex.build(store, 0, dd.filter(col("doc_id") % 4 =!= 0),
        "doc_id", "text", k = 8, family = HashFamily.Md5)
      SpanIndex.dupSpanRemovalFor(store, dd.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", k = 8, family = HashFamily.Md5)
        .orderBy(col("doc_id"))
    }),

    // per-vector affine int8 quantization (exact IEEE arithmetic both
    // engines; constant vectors → all-zero codes) — FULL oracle
    "ann06_int8_quant" -> ((s, d) => {
      Similarity.quantizeInt8(embs(s, d), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    }),

    // embedding near-dup pairs via multi-band hyperplane LSH + exact
    // cosine verification — FULL oracle (Md5 family planes; the DuckDB
    // twin reproduces the plane dot-product folds bit-for-bit, dd07
    // precedent). tau fits the testdata's random embeddings so the
    // operator demonstrably yields pairs.
    "dd06_embed_neardups" -> ((s, d) => {
      Similarity.cosineNearDups(embs(s, d), "vec_id", "embedding",
        tau = 0.4, nBits = 4, bands = 4, family = HashFamily.Md5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // exact embedding near-dup pairs — FULL oracle (DuckDB list_reduce
    // reproduces the same left-fold double arithmetic)
    "dd07_embed_exact_pairs" -> ((s, d) => {
      Similarity.exactCosinePairs(embs(s, d), "vec_id", "embedding", tau = 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // brute-force cosine top-5 for the first 10 vectors — FULL oracle
    "ann01_topk_bruteforce" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN top-5 (scale path; recall<1 vs brute force, but
    // the bucketed result itself is now FULL-oracle-exact: Md5 planes)
    "ann02_lsh_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nBits = 6, family = HashFamily.Md5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Multi-table LSH ANN top-5 (round-6 recall path: 8 independent
    // plane sets union their candidates, deduped before scoring) — FULL
    // oracle via Md5 planes; the production xxhash64 twin is floored by
    // PipelineSpec's measured-recall test.
    "ann05_lsh_multitable" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nBits = 6, family = HashFamily.Md5,
        nTables = 8)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF (k-means inverted lists) ANN top-5, probing 2 of 8 clusters —
    // FULL oracle (Md5 family: the DuckDB twin replays the seeded init,
    // both Lloyd iterations with fixed-point micro-unit means, the
    // assignment argmins, probe selection and final ranking
    // value-for-value; PipelineSpec separately pins nProbe = nClusters
    // ≡ brute force on the production family)
    "ann03_ivf_topk" -> ((s, d) => {
      val e = embs(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nClusters = 8, nProbe = 2,
        family = HashFamily.Md5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF probe over the COMMITTED index tables (ann_centroids +
    // ann_index in a SnapshotStore) — row-identical to ann03 by
    // construction (shared assign/probe plans; PipelineSpec pins it,
    // plus the incremental-append contract). FULL oracle: ann03's SQL
    // verbatim, which also hard-proves committed ≡ inline.
    "ann04_ivf_committed" -> ((s, d) => {
      val e = embs(s, d)
      val store = new graft.store.SnapshotStore(
        java.nio.file.Files.createTempDirectory("ann-index").toString, s)
      graft.pipeline.IvfIndex.build(store, 0, e, "vec_id", "embedding", nClusters = 8,
        family = HashFamily.Md5)
      // cluster-partitioned compaction so the probe takes the PRUNED
      // read path (only the probed _pfx=<cluster_id> dirs are scanned —
      // pruned ≡ unpruned, PipelineSpec pins it)
      graft.pipeline.IvfIndex.compact(store, 1, buckets = 4)
      graft.pipeline.IvfIndex.probe(store, e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nProbe = 2)
        .orderBy(col("query_id"), col("rank"))
    }),

    // SemDeDup: k-means clusters then within-cluster near-identical
    // pruning — FULL oracle (Md5 quantizer; the twin shares ann03's
    // k-means CTEs verbatim and adds the within-cluster smaller-id
    // pruning tail; PipelineSpec pins the planted-duplicate invariants
    // on the production family)
    "dd08_semdedup" -> ((s, d) => {
      Similarity.semDeDup(embs(s, d), "vec_id", "embedding",
        nClusters = 8, tau = 0.95, family = HashFamily.Md5)
        .orderBy(col("vec_id"))
    }),

    // COMMITTED MinHash-LSH band index: build on ⅔ of the corpus,
    // append the rest incrementally, then verify near-dups over the
    // committed bands — FULL oracle (Md5 family; the oracle SQL is
    // dd03's VERBATIM, which also hard-proves committed ≡ inline:
    // band rows are per-doc independent, so build+append over the
    // whole corpus produces exactly the inline pipeline's bands)
    "dd10_minhash_committed" -> ((s, d) => {
      val dd = docs(s, d)
      val store = new graft.store.SnapshotStore(
        java.nio.file.Files.createTempDirectory("dd-bands").toString, s)
      MinHashIndex.build(store, 0, dd.filter(col("doc_id") % 3 =!= 0), "doc_id", "text",
        family = HashFamily.Md5)
      MinHashIndex.append(store, 1, dd.filter(col("doc_id") % 3 === 0), "doc_id", "text",
        family = HashFamily.Md5)
      MinHashIndex.nearDups(store, dd, "doc_id", "text", tau = 0.3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // duplicate clusters: exact-cosine pairs (dd07's oracle-green pair
    // set) consolidated to connected components via alternating
    // large-star/small-star; every vector labeled with its component
    // minimum, singletons included — FULL oracle (recursive CTE twin)
    "dd09_dup_clusters" -> ((s, d) => {
      val e = embs(s, d)
      val pairs = Similarity.exactCosinePairs(e, "vec_id", "embedding", tau = 0.4)
        .select(col("id_a"), col("id_b"))
      Dedup.dupClusters(e.select(col("vec_id")), "vec_id", pairs)
        .select(col("id").as("vec_id"), col("component"),
          col("cluster_size"), col("is_keeper"))
        .orderBy(col("vec_id"))
    }),

    // END-TO-END text dedup: MinHash-LSH near-dup pairs → connected
    // components → keeper verdict over every document — FULL oracle
    // (Md5 family pairs + dd09's recursive-CTE transitive-closure
    // tail over them)
    "dd11_text_dup_clusters" -> ((s, d) => {
      val dd = docs(s, d)
      val pairs = Dedup.minhashNearDups(dd, "doc_id", "text", tau = 0.3,
          family = HashFamily.Md5)
        .select(col("id_a"), col("id_b"))
      Dedup.dupClusters(dd.select(col("doc_id")), "doc_id", pairs)
        .select(col("id").as("doc_id"), col("component"),
          col("cluster_size"), col("is_keeper"))
        .orderBy(col("doc_id"))
    }),

    // C4/Gopher-style curation verdict (quality + langid + exact-dup,
    // composed per-row, one shuffle) — FULL oracle
    "pipe01_c4_filter" -> ((s, d) => {
      Curation.c4Filter(docs(s, d), "doc_id", "text").orderBy(col("doc_id"))
    }),

    // deterministic hash-stratified sampling (md5 threshold strings,
    // rate 0.5 for en / 0.25 default) — FULL oracle
    "pipe02_sample_stratified" -> ((s, d) => {
      Curation.sampleStratified(docs(s, d), "doc_id", "lang",
        Map("en" -> 0.5), defaultFraction = 0.25).orderBy(col("doc_id"))
    }),

    // greedy sequence packing into 512-token bins per language — FULL
    // oracle (windowed prefix sums)
    "pipe03_pack_sequences" -> ((s, d) => {
      Curation.packSequences(docs(s, d), "doc_id", "text", "lang",
        budgetTokens = 512).orderBy(col("doc_id"))
    }),

    // benchmark-contamination screen (3-gram containment vs the
    // doc_id%97==0 eval slice) — FULL oracle
    "pipe04_contamination" -> ((s, d) => {
      Curation.contamination(docs(s, d), "doc_id", "text",
        isEval = col("doc_id") % 97 === 0, shingleK = 3, tau = 0.5)
        .orderBy(col("doc_id"))
    }),

    // per-language quality-percentile gate (keep top 40%) — FULL oracle
    "pipe05_quality_percentile" -> ((s, d) => {
      Curation.qualityPercentile(docs(s, d), "doc_id", "text", "lang",
        topFraction = 0.4).orderBy(col("doc_id"))
    }),

    // PII scan + redaction verdict (counts per pattern + redacted-text
    // md5; RE2-subset regexes shared with the oracle) — FULL oracle
    "pipe06_pii" -> ((s, d) => {
      Curation.piiScan(docs(s, d), "doc_id", "text").orderBy(col("doc_id"))
    }),

    // deterministic training-order shuffle: replayable (shard, pos)
    // from md5(seed:id), 16 shards — FULL oracle
    "pipe07_shuffle" -> ((s, d) => {
      Curation.shuffleDeterministic(docs(s, d), "doc_id", seed = "epoch0")
        .orderBy(col("doc_id"))
    }),

    // the full curation pipeline END-TO-END: c4 keep verdict →
    // deterministic shuffle assignment over the KEPT set — FULL oracle
    // (pipe01's verdict CTEs + pipe07's shuffle tail, shared verbatim)
    "pipe09_curation_pipeline" -> ((s, d) => {
      val kept = Curation.c4Filter(docs(s, d), "doc_id", "text")
        .filter(col("kept"))
        .select(col("doc_id"), col("lang_pred"), col("quality"))
      val shuffled = Curation.shuffleDeterministic(kept, "doc_id", seed = "epoch0")
      kept.join(shuffled.select(col("doc_id"), col("shard"), col("pos")), Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // span-level eval decontamination (remove the k-token spans shared
    // with the eval split; pipe04's doc_id % 97 eval convention; k=4
    // fires on 8 train docs at this corpus scale — k=8 finds no
    // cross-split verbatim runs in the synthetic text) — FULL oracle
    "pipe11_span_decontaminate" -> ((s, d) => {
      val dd = docs(s, d)
      Curation.spanDecontaminate(
          dd.filter(col("doc_id") % 97 =!= 0),
          dd.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 4, family = HashFamily.Md5)
        .orderBy(col("doc_id"))
    }),

    // cross-source shingle-overlap matrix (Jaccard + both directed
    // containments per source pair) — FULL oracle
    "pipe10_source_overlap" -> ((s, d) => {
      Curation.sourceOverlapMatrix(docs(s, d), "source", "text", shingleK = 3)
        .orderBy(col("source_a"), col("source_b"))
    }),

    // data-mixture composition per (lang, source) stratum — FULL oracle
    "pipe08_mixture" -> ((s, d) => {
      Curation.mixtureTable(docs(s, d), "text", Seq("lang", "source"))
        .orderBy(col("lang"), col("source"))
    }),

    // token counting — FULL oracle
    "ta01_token_stats" -> ((s, d) => {
      TextAnalysis.tokenStats(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // quality scoring — FULL oracle
    "ta02_quality" -> ((s, d) => {
      TextAnalysis.qualityScore(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // language-ID heuristic (rows-only; text is synthetic)
    "ta03_langid" -> ((s, d) => {
      TextAnalysis.langId(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Gopher repetition signals (top n-gram fraction, duplicated
    // unigram/5-gram mass) — FULL oracle
    "ta05_repetition" -> ((s, d) => {
      TextAnalysis.repetitionSignals(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // tokenizer-vocabulary top-30 by collection frequency (df alongside,
    // deterministic tie-break) — FULL oracle
    "ta06_vocab" -> ((s, d) => {
      TextAnalysis.vocabTopK(docs(s, d), "doc_id", "text", k = 30)
        .orderBy(col("cf").desc, col("token").asc)
    }),

    // corpus 1..3-gram count table, cf >= 3 (the CCNet-style count-LM
    // prep artifact) — FULL oracle
    "ta09_ngram_counts" -> ((s, d) => {
      TextAnalysis.ngramCounts(docs(s, d), "doc_id", "text",
          maxN = 3, minCount = 3)
        .orderBy(col("n"), col("gram"))
    }),

    // per-doc top-5 TF-IDF terms (linear idf — bit-identical IEEE ops
    // cross-engine; ranks tie-broken by token before rounding) —
    // FULL oracle
    "ta08_tfidf" -> ((s, d) => {
      TextAnalysis.tfidfTopTerms(docs(s, d), "doc_id", "text", k = 5)
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Flesch-style readability (regex word/sentence/syllable proxies) —
    // FULL oracle
    "ta07_readability" -> ((s, d) => {
      TextAnalysis.readability(docs(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // winnowing fingerprint — FULL oracle (Md5 family: DuckDB
    // recomputes the word hashes, window minima and the fingerprint
    // digest value-for-value)
    "ta04_fingerprint" -> ((s, d) => {
      TextAnalysis.winnowingFingerprint(docs(s, d), "doc_id", "text",
          family = HashFamily.Md5)
        .select(col("doc_id"), col("fp_hash"))
        .orderBy(col("doc_id"))
    }),

    // multimodal metadata through the binary pipeline — oracle on
    // byte length + md5 (the stub's deterministic outputs)
    "mm01_media_meta" -> ((s, d) => {
      implicit val spark: SparkSession = s
      Multimodal.extractFeatures(
        Multimodal.asMedia(docs(s, d), "doc_id", "text"))
        .select(col("media_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("payload_md5"))
        .orderBy(col("media_id"))
    }),

    // multimodal feature extraction incl. batch shape (rows-only)
    "mm02_media_features" -> ((s, d) => {
      implicit val spark: SparkSession = s
      Multimodal.extractFeatures(
        Multimodal.asMedia(docs(s, d), "doc_id", "text"), batchSize = 32)
        // batch_size is partition-shape-dependent — excluded from output
        .select(col("media_id"), round(element_at(col("feature"), 1), 6).as("f0"))
        .orderBy(col("media_id"))
    }))
}

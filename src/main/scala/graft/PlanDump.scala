package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Physical-plan evidence dump: writes PLANS.md with
  * `explain("formatted")` output for the flagship query paths, so the
  * plan-shape claims (pushdown, pruning, broadcast-vs-shuffle choices,
  * top-k, LSH banding, committed-index scan) are inspectable without
  * running anything. Regenerate with:
  *
  *   sbt -batch "runMain graft.PlanDump [sfDir]"
  *
  * The hard plan INVARIANTS are enforced by PlanSpec/SequencerSpec/
  * CrawlSpec asserts — this file is the human-readable companion.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val picks: Seq[(String, String)] = Seq(
      "q01_pricing_summary" ->
        ("A1 grouped aggregation: filters/projection reach the parquet scan " +
          "(PushedFilters/ReadSchema), partial+final hash aggregate, one " +
          "WholeStageCodegen span per side of the shuffle."),
      "q02_revenue_by_nation" ->
        ("J1 star join: fact side streams through BroadcastHashJoins for the " +
          "genuinely-small dims (explicit broadcast hints)."),
      "q03_topk_orders" ->
        "W1 global top-k plans as TakeOrderedAndProject — no global sort.",
      "q10_set_ops" ->
        ("O3/O4/O5 in ONE pass: full-outer join on the key with membership " +
          "flags, single aggregation emits union/except/intersect counts — " +
          "no driver-side counting."),
      "dd03_minhash_lsh_pairs" ->
        ("MinHash+LSH near-dup pairs (Md5 oracle parameterization; round 7 " +
          "fused like the xx64 family): signatures and band hashes are " +
          "codegen'd kernel projections (md5_minhash_sigs / " +
          "md5_lsh_band_hashes — zero explode rows, zero aggregate " +
          "exchanges), banding → per-bucket equi-join on (band, bucket), " +
          "Jaccard verify on candidates only — never all-pairs."),
      "ann01_topk_bruteforce" ->
        ("ANN exact baseline: queries broadcast, per-pair codegen'd vec_dot " +
          "with per-vector norms hoisted to once per side (round 7), " +
          "salted two-phase top-k per query."),
      "ann05_lsh_multitable" ->
        ("Multi-table LSH ANN (round-6; round-7 fused): all L plane-set " +
          "signatures come from ONE codegen'd hyperplane_sigs kernel pass " +
          "with cached plane components (posexplode of the L-signature " +
          "array), one equi-join on (table, bucket) serves all tables, " +
          "candidate pairs dedup BEFORE the cosine scoring, salted " +
          "two-phase top-k — the recall knob adds no extra corpus scans."),
      "crawl05_search" ->
        ("FTS over the COMMITTED pages_fts table: the term predicate is " +
          "pushed to the parquet scan of the index (PushedFilters: In(term)), " +
          "dedup + scoring aggregate over the tiny hit set, pagination as " +
          "TakeOrderedAndProject."),
      "ann04_ivf_committed" ->
        ("IVF probe over the COMMITTED ann_centroids/ann_index snapshot " +
          "tables: the index is a parquet scan, not a per-call k-means " +
          "rebuild, and after IvfIndex.compact (round 5) the scan's file " +
          "list covers ONLY the probed _pfx=<cluster_id> partition dirs — " +
          "the probed ids are computed driver-side first (≤ nClusters) and " +
          "pushed into the read, so the 10^10-row index is never rescanned " +
          "per query batch; qprobe (queries × broadcast centroids, " +
          "top-nProbe) broadcasts into the inverted-list equi-join on " +
          "cluster_id."),
      "pipe01_c4_filter" ->
        ("Curation verdict (round-4): quality + langid composed PER ROW in " +
          "one projection over the documents scan; the exact-dup keeper is " +
          "a partial-aggregated groupBy on the content hash joined back " +
          "(never a hash window — one doc duplicated 10^9 times must not " +
          "land in one task), and no per-dimension sub-plan join exists."),
      "pipe04_contamination" ->
        ("Contamination screen (round-4): one exploded shingle scan; the " +
          "distinct eval-shingle side BROADCASTs into the hit join; sizes " +
          "and hits are partial-aggregated before their equi-join — no " +
          "all-pairs, no SinglePartition."),
      "dd08_semdedup" ->
        ("SemDeDup (round-4): deterministic k-means assignment against " +
          "broadcast centroids, within-cluster pair join on cluster_id " +
          "(bounded per cluster, never all-pairs), smaller-id-neighbor " +
          "min-aggregate picks one keeper per near-dup neighborhood."),
      "dd09_dup_clusters" ->
        ("Duplicate-cluster consolidation (round-4): the dumped plan is " +
          "the final labeling join (star-forest edges ⟕ id universe + a " +
          "grouped size join on component — no per-component window); " +
          "each preceding large-star/small-star " +
          "phase — already executed when this plan is built, since the CC " +
          "loop is iterative — computes per-node neighborhood minima as a " +
          "partial-aggregated groupBy joined back to the edge list, " +
          "partitioned by NODE id, so no component ever gathers in a task."),
      "ta05_repetition" ->
        ("Gopher repetition signals (round-7 reshape): grams arrive " +
          "ALREADY COUNTED per doc from the gram_counts kernel — the " +
          "groupBy(id, n, gram) exchange is gone; one explode of counted " +
          "rows → per-(id, n) partial-aggregated stats → conditional-agg " +
          "pivot; no windows, no SinglePartition, one corpus scan for all " +
          "four n."),
      "pipe09_curation_pipeline" ->
        ("End-to-end curation composition: the c4 verdict is per-row " +
          "expressions over one documents scan plus the grouped exact-dup " +
          "keeper join on the content hash; the kept set flows into the " +
          "md5 shuffle assignment's per-shard rank — joins plus one " +
          "bounded-shard window, no collects."),
      "dd12_dup_span_removal" ->
        ("Duplicate-span removal (exact-substring dedup; round-7 fused " +
          "window hashing): one token scan → the window_hashes kernel " +
          "computes every window's 8-byte key in one pass (posexplode " +
          "kept), map-side-combined count on the hash, semi join back on " +
          "the same key, coverage explode only for DUPLICATED windows, " +
          "per-doc coverage-array aggregate + narrow index-lambda rebuild " +
          "— no per-token row crosses an exchange."),
      "ta08_tfidf" ->
        ("Per-doc TF-IDF top-k (round-7 reshape): tf comes already counted " +
          "per doc from the gram_counts kernel (NO tf exchange), df " +
          "aggregates the same doc-unique rows, token-key join back, " +
          "per-doc row_number window (partitioned — no global sort)."),
      "pipe10_source_overlap" ->
        ("Cross-source overlap matrix (round-7 reshape): ONE corpus-sized " +
          "exchange — groupBy(shingle) with a partial-combined " +
          "collect_set(source) (bounded by #sources) — then sizes and " +
          "pair-intersection counts derive from that shingle-count-sized " +
          "table; fan-out stays ≤ C(#sources, 2) per shingle, never " +
          "doc-quadratic, and the old self-join's three corpus subtrees " +
          "are gone."),
      "pipe11_span_decontaminate" ->
        ("Span decontamination: dd12's window/coverage/rebuild plan with " +
          "the flag set swapped to the eval split's distinct window " +
          "hashes (broadcast — eval sets are small; shuffle-hash knob " +
          "for huge ones)."),
      "ta09_ngram_counts" ->
        ("N-gram count table (round-7 reshape): every n's grams arrive " +
          "ALREADY COUNTED per doc from ONE gram_counts kernel pass (not a " +
          "scan+shuffle pair per n, and no per-occurrence rows), then ONE " +
          "partial-aggregatable groupBy(n, gram) computes cf and df; " +
          "minCount filters the aggregated output."),
      "dd13_span_committed" ->
        ("Committed span census, batch probe: the batch's window hashes " +
          "aggregate to delta counts, the census side is a hash-prefix-" +
          "pruned committed read semi-joined to the touched hashes, the " +
          "flag is delta+committed count >= 2, and the coverage/rebuild " +
          "tail is dd12's."))

    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by `graft.PlanDump`)\n\n")
    sb.append(s"Scale factor dir: `$sfDir`. Plans are `explain(\"formatted\")` " +
      "output; the binding plan INVARIANTS live in PlanSpec / SequencerSpec / " +
      "CrawlSpec asserts (no SinglePartition in the sequencer, salted " +
      "politeness top-k, TakeOrderedAndProject pagination, BHJ on dims, " +
      "pruning/pushdown).\n")
    // production-family (xx64) twins of the Md5-parameterized queries
    // entries — the fused signature/band plans the bench series measure
    val extraPicks: Seq[(String, String, org.apache.spark.sql.DataFrame)] = Seq(
      ("dd03_minhash_xx64 (production family, not a queries entry)",
        "MinHash+LSH with the fused xx64 stages (round-6): signatures are " +
          "ONE codegen'd projection off the documents scan (minhash_sigs — " +
          "no shingle explode, no 64-min aggregate, null gate pushed to the " +
          "scan as IsNotNull(text)); band hashes are one pass over the " +
          "signature array (lsh_band_hashes) feeding the posexplode the " +
          "bucket equi-join consumes; Jaccard verify on candidates only. " +
          "The queries-map dd03 entry above keeps the Md5 composition the " +
          "DuckDB oracle twins.",
        graft.pipeline.Dedup.minhashNearDups(
          graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
          tau = 0.3)),
      ("dd04_simhash_xx64 (production family, not a queries entry)",
        "SimHash near-dups with the fused xx64 signature (round-6): the " +
          "packed 64-bit signature is ONE codegen'd projection per document " +
          "(simhash64 — no token explode, no 64-sum aggregate; the no-token " +
          "drop is the input-only rlike filter, evaluated without running " +
          "the kernel twice), then 16-bit-chunk blocking join + exact " +
          "Hamming verify.",
        graft.pipeline.Dedup.simhashNearDups(
          graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
          maxHamming = 8)))

    picks.foreach { case (name, commentary) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$commentary\n\n```\n")
      sb.append(plan.take(12000))
      sb.append("\n```\n")
    }
    extraPicks.foreach { case (name, commentary, df) =>
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$commentary\n\n```\n")
      sb.append(plan.take(12000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${picks.size + extraPicks.size} plans)")
    spark.stop()
  }
}

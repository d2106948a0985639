package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation operators — the composition layer a
  * 100-TB pretraining pipeline runs on top of the per-dimension
  * primitives (TextAnalysis / Dedup): filter-verdicts, deterministic
  * stratified sampling, sequence packing, benchmark-contamination
  * screening. All stock Catalyst expressions (codegen'd), DuckDB-oracle
  * checkable, deterministic under any partitioning.
  */
object Curation {

  /** C4/Gopher-style keep/reject verdict per document, composed PER ROW
    * from the shared quality/langid column builders plus the exact-dup
    * window — ONE shuffle total (on the content hash), no join of
    * per-dimension sub-DataFrames. `reject_reason` is the FIRST failing
    * check in the fixed order duplicate → too_short → too_long →
    * low_quality → lang, mirroring how curation pipelines report drops.
    */
  def c4Filter(
      docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 5, maxTokens: Int = 5000,
      minQuality: Double = 0.55,
      langs: Seq[String] = Seq("de", "en", "es", "fr")): DataFrame = {
    val q = TextAnalysis.qualityStruct(col(textCol))
    // keeper per content hash via partial-agg groupBy + join, NOT a hash
    // window — one doc duplicated 10^9 times must never land in one task
    // (same shape as Dedup.exact / dupClusters)
    val hashed = docs
      .select(col(idCol), col(textCol), q.as("q"),
        TextAnalysis.langPredCol(col(textCol)).as("lang_pred"),
        md5(col(textCol)).as("content_hash"))
    val keepers = hashed.groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"))
    val base = hashed.join(keepers, Seq("content_hash"))
      .withColumn("is_duplicate", col(idCol) =!= col("keeper_id"))
      .select(col(idCol), col("lang_pred"),
        col("q.n_tokens").as("n_tokens"), col("q.quality").as("quality"),
        col("is_duplicate"))
    val reason = when(col("is_duplicate"), "duplicate")
      .when(col("n_tokens") < minTokens, "too_short")
      .when(col("n_tokens") > maxTokens, "too_long")
      .when(col("quality") < minQuality, "low_quality")
      .when(!col("lang_pred").isin(langs: _*), "lang")
      .otherwise("")
    base
      .withColumn("reject_reason", reason)
      .withColumn("kept", col("reject_reason") === "")
  }

  /** Deterministic hash-based stratified sampling: a document is kept
    * iff the first 4 hex chars of `md5(id ":" stratum)` sort below the
    * stratum's threshold — a pure function of the row (no RNG state, no
    * partition dependence, replayable), with per-stratum rates.
    * Thresholds are compared as STRINGS (lowercase-hex lexicographic =
    * numeric on equal length; "zzzz" = keep-all), so the DuckDB oracle
    * mirrors it with no hex→int conversion.
    */
  def sampleStratified(
      docs: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double): DataFrame = {
    def thr(f: Double): String =
      if (f >= 1.0) "zzzz"
      else f"${math.max(0L, math.floor(f * 65536).toLong)}%04x"
    val thrCol = fractions.foldLeft(lit(thr(defaultFraction))) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(thr(f))).otherwise(acc)
    }
    docs.select(
      col(idCol), col(strataCol),
      substring(md5(concat(col(idCol).cast("string"), lit(":"), col(strataCol))),
        1, 4).as("sample_key"),
      thrCol.as("threshold"))
      .withColumn("kept", col("sample_key") < col("threshold"))
  }

  /** Greedy sequence packing for training batches: documents are packed
    * in id order within each (stratum, id-block); `pack_id` = which
    * `budget`-token bin the document's EXCLUSIVE prefix sum (within its
    * block) lands in (a pack may overflow by at most one document — the
    * standard streaming-packing contract). Packs never span blocks, so
    * the window key is (stratum, block) — at 10^10 docs a
    * stratum-only window would funnel each language through ONE task;
    * blocks of `blockDocs` ids bound every window partition while
    * keeping the result a pure deterministic function of the row set
    * (block = id / blockDocs, not anything partition-dependent).
    * `pack_id` is globally unique: (block, within-block bin) packed as
    * block * ceil(blockTokenMax/budget)-free composite via bit split —
    * here simply block * 2^32 + bin (bins per block < 2^32 by budget ≥ 1).
    */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Int,
      blockDocs: Long = 1L << 20): DataFrame = {
    val block = floor(col(idCol).cast("long") / lit(blockDocs.toDouble)).cast("long")
    val w = Window.partitionBy(col(strataCol), col("block")).orderBy(col(idCol))
    docs
      .select(col(idCol), col(strataCol),
        size(TextAnalysis.wsTokens(col(textCol))).as("n_tokens"),
        block.as("block"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        shiftleft(col("block"), 32).bitwiseOR(
          floor((col("cum_tokens") - col("n_tokens")) /
            lit(budgetTokens.toDouble)).cast("long")))
      .drop("block")
  }

  /** Per-stratum quality-percentile gate: keep the top `topFraction` of
    * documents by quality WITHIN each stratum (the dynamic-threshold
    * variant of C4's fixed cutoff — a fixed threshold keeps wildly
    * different fractions per language). Percentile = `cume_dist` over
    * the stratum (exact, SQL-standard tie semantics — identical in the
    * DuckDB oracle). NOTE: exact per-stratum ranking sorts each stratum
    * globally; at 10^10 docs use `approx_percentile(quality, 1-p)` per
    * stratum to derive a threshold in one aggregation and broadcast it —
    * same decision boundary up to sketch error, no global sort. The
    * exact form here IS the oracle-checkable spec of that boundary.
    */
  def qualityPercentile(
      docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, topFraction: Double): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("quality"))
    docs
      .select(col(idCol), col(strataCol),
        TextAnalysis.qualityStruct(col(textCol)).getField("quality").as("quality"))
      .withColumn("q_pct", round(cume_dist().over(w), 6))
      .withColumn("kept", col("q_pct") > lit(1.0 - topFraction))
  }

  /** The 10^10-doc twin of [[qualityPercentile]]: derive one quality
    * threshold per stratum with `percentile_approx` in a single
    * aggregation (no per-stratum global sort), broadcast the tiny
    * threshold table, keep `quality > threshold`. Decisions equal the
    * exact gate except possibly AT the threshold value itself (tie
    * semantics; sketch error at extreme scale) — PipelineSpec pins that
    * every disagreement sits exactly on the boundary.
    */
  def qualityThresholdApprox(
      docs: DataFrame, idCol: String, textCol: String,
      strataCol: String, topFraction: Double,
      accuracy: Int = 10000): DataFrame = {
    val scored = docs.select(col(idCol), col(strataCol),
      TextAnalysis.qualityStruct(col(textCol)).getField("quality").as("quality"))
    val thresholds = scored.groupBy(col(strataCol))
      .agg(percentile_approx(col("quality"), lit(1.0 - topFraction),
        lit(accuracy)).as("q_threshold"))
    scored.join(broadcast(thresholds), Seq(strataCol))
      .withColumn("kept", col("quality") > col("q_threshold"))
  }

  /** Benchmark-contamination screen: fraction of a training document's
    * k-word shingles that also occur in the eval set (CONTAINMENT, not
    * Jaccard — the conventional contamination metric). The eval side is
    * distinct shingles only (small) and broadcast; the train side is one
    * exploded scan — no all-pairs anywhere.
    */
  def contamination(
      docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, shingleK: Int = 3, tau: Double = 0.5,
      /** benchmark eval sets are small — broadcast by default; pass
        * false for a huge eval corpus and the hit join shuffle-hashes on
        * the shingle instead (same rows, explicit cost — the robots-gate
        * regime pattern). */
      broadcastEval: Boolean = true): DataFrame = {
    val sh = docs.select(col(idCol), isEval.as("is_eval"),
      explode(Dedup.shingleSet(col(textCol), shingleK)).as("s"))
    val evalSh0 = sh.filter(col("is_eval")).select(col("s")).distinct()
    val evalSh = if (broadcastEval) broadcast(evalSh0) else evalSh0.hint("shuffle_hash")
    val train = sh.filter(!col("is_eval"))
    val sizes = train.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val hits = train.join(evalSh, Seq("s"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    sizes.join(hits, Seq(idCol), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("containment",
        round(col("n_hit").cast("double") / col("n_shingles"), 6))
      .withColumn("contaminated", col("containment") >= tau)
  }

  /** Span-level decontamination — the surgical counterpart of
    * [[contamination]]'s whole-doc verdict: instead of dropping a
    * training document whose shingle containment crosses tau, remove
    * exactly the k-token spans that appear verbatim in the eval set
    * (the published decontamination recipes do both: flag at the doc
    * level, excise at the span level when the document is otherwise
    * valuable). Reuses [[Dedup.dupSpanRemoval]]'s machinery: eval-side
    * window hashes become the flag set ([[Dedup.windowHashes]] under the
    * same injectable family), a train window is covered iff its hash is
    * in that set, and the rebuild is the shared coverage tail
    * ([[Dedup.removeCovered]]). Eval items shorter than k tokens carry
    * no k-window and are invisible here — that regime is exactly what
    * the shingle-containment [[contamination]] screen covers.
    *
    * Output per TRAIN doc: `(idCol, n_tokens, n_removed, kept_text)`.
    */
  def spanDecontaminate(
      trainDocs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, k: Int = 8,
      family: HashFamily = HashFamily.XxHash64,
      /** eval sets are small — broadcast by default (the
        * [[contamination]] knob pattern). */
      broadcastEval: Boolean = true): DataFrame = {
    require(k >= 1, s"window size k must be >= 1, got $k")
    val toks = trainDocs.select(col(idCol).as("did"),
      Dedup.tokenSeq(col(textCol)).as("tk"))
    val evalToks = evalDocs.select(col(idCol).as("did"),
      Dedup.tokenSeq(col(textCol)).as("tk"))
    val evalW0 = Dedup.windowHashes(evalToks, k, family).select("wh").distinct()
    val evalW = if (broadcastEval) broadcast(evalW0) else evalW0.hint("shuffle_hash")
    val flagged = Dedup.windowHashes(toks, k, family).join(evalW, Seq("wh"), "left_semi")
    Dedup.removeCovered(toks, flagged, idCol, k)
  }

  /** PII patterns, shared by [[piiScan]] and its oracle twin. Written in
    * the RE2-compatible subset (no lookarounds, no backrefs) so Java's
    * regex and DuckDB's RE2 match IDENTICAL spans — the q17/ta01
    * cross-engine-regex precedent. ASCII classes only (`\d` is ASCII in
    * both engines without flags).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b"))

  /** PII scan + redaction verdict per document: occurrence counts per
    * pattern and the md5 of the text after replacing each match with its
    * `<KIND>` tag, applied in the fixed PiiPatterns order (email → ipv4
    * → ssn, so an email never half-redacts into an ipv4 false positive).
    * Pure per-row regexp expressions — codegen'd, zero shuffles, trivially
    * 100-TB-parallel; the md5 keeps the verdict row narrow so the
    * redacted text itself never rides a shuffle.
    */
  def piiScan(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = PiiPatterns.map { case (kind, rx) =>
      size(regexp_extract_all(col(textCol), lit(rx), lit(0))).as(s"n_$kind")
    }
    val redacted = PiiPatterns.foldLeft(col(textCol)) { case (acc, (kind, rx)) =>
      regexp_replace(acc, rx, s"<${kind.toUpperCase}>")
    }
    docs.select((col(idCol) +: counts) :+ md5(redacted).as("redacted_md5"): _*)
      .withColumn("has_pii",
        PiiPatterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
  }

  /** Data-mixture composition table: per stratum (e.g. lang × source)
    * document / token / char mass plus each stratum's fraction of the
    * global mass — the mixture-weights input every pretraining run
    * starts from. One partial-aggregatable groupBy over the corpus; the
    * whole-frame fraction window runs on the AGGREGATED table, which is
    * |strata| rows by construction — the one place a SinglePartition
    * exchange is correct, because the input is already driver-small.
    */
  def mixtureTable(
      docs: DataFrame, textCol: String, strataCols: Seq[String]): DataFrame = {
    val base = docs.select(
      strataCols.map(col) :+
        size(TextAnalysis.wsTokens(col(textCol))).as("n_tokens") :+
        length(col(textCol)).as("n_chars"): _*)
    val agg = base.groupBy(strataCols.map(col): _*).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("token_mass"),
      sum(col("n_chars")).as("char_mass"))
    val w = Window.partitionBy()
    agg
      .withColumn("doc_frac",
        round(col("n_docs").cast("double") / sum(col("n_docs")).over(w), 6))
      .withColumn("token_frac",
        round(col("token_mass").cast("double") / sum(col("token_mass")).over(w), 6))
  }

  /** Cross-source overlap matrix — the corpus-audit table answering
    * "how much of source A repeats in source B" before mixing weights
    * are chosen: per unordered source pair, the Jaccard of the sources'
    * distinct k-shingle sets plus BOTH directed containments (a heavily
    * contained source is a subset-dump of another and should not be
    * double-weighted). Set algebra as joins+aggs:
    *
    *   1. one fused shingle scan per doc, distinct-ed to (source,
    *      shingle) — map-side-combined, the only corpus-sized exchange;
    *   2. per-source set sizes (tiny);
    *   3. shingle-key self-join restricted to source_a < source_b: the
    *      fan-out per shingle is bounded by C(#sources, 2), so rows are
    *      O(distinct shingles × present-pair count), never quadratic in
    *      docs; count per pair is map-side-combined.
    *
    * At 100 TB the shingle strings would key as 8-byte family hashes
    * (dd12's trade); the exact-string form here is what the DuckDB
    * oracle replays verbatim.
    */
  def sourceOverlapMatrix(
      docs: DataFrame, srcCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    // round 7 reshape (values identical — pipe10's exact oracle pins
    // them; [[sourceOverlapMatrixComposed]] is the executable spec):
    // ONE corpus-sized exchange total. The composed form's
    // distinct → (sizes + shingle-key self-join) re-derives the
    // corpus-scan subtree three times and shuffles the distinct
    // (source, shingle) rows again for the join; instead, group BY
    // SHINGLE once with a partial-combined collect_set(source) — the
    // per-shingle source set is bounded by #sources, always tiny — and
    // derive BOTH the per-source sizes and the per-pair intersection
    // counts from that driver-free, shingle-count-sized table. The
    // source-pair fan-out per shingle stays ≤ C(#sources, 2).
    val bySh = docs
      .select(col(srcCol).as("source"),
        explode(Dedup.shingleSet(col(textCol), shingleK)).as("sh"))
      .groupBy(col("sh")).agg(collect_set(col("source")).as("srcs"))
    val sizes = bySh.select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = bySh
      .select(col("srcs"), explode(col("srcs")).as("source_a"))
      .select(col("source_a"), explode(col("srcs")).as("source_b"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("sz").as("sz_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("sz").as("sz_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("i"), col("sz_a"),
        col("sz_b"),
        round(col("i").cast("double") / (col("sz_a") + col("sz_b") - col("i")), 6)
          .as("jaccard"),
        round(col("i").cast("double") / col("sz_a"), 6).as("containment_a"),
        round(col("i").cast("double") / col("sz_b"), 6).as("containment_b"))
  }

  /** the defining composition (see [[sourceOverlapMatrix]]): distinct
    * (source, shingle) rows + shingle-key self-join — the executable
    * spec the grouped reshape is property-pinned against
    * (GramCountsSpec).
    */
  private[graft] def sourceOverlapMatrixComposed(
      docs: DataFrame, srcCol: String, textCol: String,
      shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(srcCol).as("source"),
        explode(Dedup.shingleSet(col(textCol), shingleK)).as("sh"))
      .distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = sh.select(col("source").as("source_a"), col("sh"))
      .join(sh.select(col("source").as("source_b"), col("sh")), Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("source").as("source_a"), col("sz").as("sz_a")),
        Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("sz").as("sz_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("i"), col("sz_a"),
        col("sz_b"),
        round(col("i").cast("double") / (col("sz_a") + col("sz_b") - col("i")), 6)
          .as("jaccard"),
        round(col("i").cast("double") / col("sz_a"), 6).as("containment_a"),
        round(col("i").cast("double") / col("sz_b"), 6).as("containment_b"))
  }

  /** Deterministic global shuffle for training-order assignment: every
    * document gets a replayable pseudo-random (shard, pos) from
    * `md5(seed:id)` — no RNG state, identical under any partitioning or
    * cluster size (the sampleStratified md5 convention).
    *
    * `shardHexChars` ∈ [1,3] gives 16 / 256 / 4096 shards via the key's
    * leading hex digits. `pos` is the dense within-shard rank (window
    * per shard): choose the shard count so one shard fits a task —
    * 4096 shards ≈ 2.4M docs/shard at 10^10 — exactly the
    * seen-table prefix-layout sizing rule. The md5 key, not the id,
    * orders the shard, so adjacent source docs scatter across batches.
    */
  def shuffleDeterministic(
      docs: DataFrame, idCol: String, seed: String,
      shardHexChars: Int = 1): DataFrame = {
    require(shardHexChars >= 1 && shardHexChars <= 3,
      s"shardHexChars must be 1..3, got $shardHexChars")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val hexVal = (0 until shardHexChars).map { i =>
      (instr(lit("0123456789abcdef"), substring(col("shuffle_key"), i + 1, 1)) - 1) *
        lit(math.pow(16, shardHexChars - 1 - i).toInt)
    }.reduce[Column](_ + _)
    docs.select(col(idCol), key.as("shuffle_key"))
      .withColumn("shard", hexVal.cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("shuffle_key"), col(idCol))))
  }
}

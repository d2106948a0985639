package graft.queries

import graft.{SparkEntry, SparkTestSession}
import graft.frontier.Politeness
import graft.model.CrawlConfig
import graft.pipeline.{Dedup, HashFamily}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests (SURVEY.md §4): the scale properties —
  * column pruning into the parquet scan, predicate pushdown, broadcast
  * joins for dims, map-side partial aggregation, salted two-phase
  * windows — asserted on the optimized plans so a refactor can't silently
  * regress them.
  */
class PlanSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: parquet scan pruned to the 5 needed lineitem columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_orderkey"), "scan reads l_orderkey it never needs")
    assert(!p.contains("l_shipdate"), "scan reads l_shipdate it never needs")
    assert(p.contains("l_returnflag") && p.contains("l_quantity"))
  }

  test("q01: aggregation is partial (map-side combine) + final") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("Partial"),
      "no map-side partial aggregation in the plan")
  }

  test("q18: dimension join is a BroadcastHashJoin") {
    assert(plan("q18_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("q04/q05: semi and anti joins planned as such") {
    assert(plan("q04_semi_join").contains("LeftSemi"))
    assert(plan("q05_anti_join").contains("LeftAnti"))
  }

  test("q03: global top-k plans as TakeOrderedAndProject (no full sort)") {
    assert(plan("q03_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_custkey") === 42).select("o_orderkey")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_custkey), EqualTo(o_custkey,42)]"),
      s"filter not pushed to scan:\n$p")
  }

  test("politeness: phase-1 window is salted (no single-task hot host)") {
    val frontier = Seq(("http://a.onion/", "a.onion", 2, "new", 0, 1L, "", 1, 0))
      .toDF("url", "host", "priority", "tier", "depth", "enqueue_seq",
        "discovered_from", "round", "retries")
      .withColumn("crawl_delay", lit(10.0))
      .withColumn("pages_crawled", lit(0))
    val p = Politeness.schedule(frontier, CrawlConfig())
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), "phase-1 window lost its salt")
    assert("row_number".r.findAllIn(p).size >= 2, "expected two ranking phases")
  }

  test("minhash signatures (xx64): pure projection, zero exchanges/aggregates") {
    // the fused MinHashSigs expression makes the whole signature stage a
    // per-row projection off the scan — no shingle explode, no 64-min
    // aggregate, no exchange, and the null gate is the pushed-down
    // IsNotNull(text) (NOT an isnotnull over the expression, which would
    // evaluate the kernel twice: once in Filter, once in Project)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("minhash_sigs"), "fused expression missing from plan")
    assert(!p.contains("Exchange"), "fused signature stage must not shuffle")
    assert(!p.contains("HashAggregate"), "fused signature stage must not aggregate")
    assert(!p.contains("Generate"), "fused signature stage must not explode")
    assert("minhash_sigs".r.findAllIn(p).size <= 2, // Project + scan-schema echo
      s"minhash_sigs evaluated more than once:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"),
      "null gate should be the pushed-down input filter")
    assert(!p.contains("CollectLimit"))
  }

  test("minhash signatures (Md5 oracle family): one partial+final hash aggregate") {
    // the composition stays the executable spec + oracle path: exploded
    // shingles, map-side-combined mins
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Dedup.minhashSignaturesComposed(docs, "doc_id", "text", 3, 8,
        HashFamily.Md5)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_min") || p.contains("Partial"),
      "minhash mins not map-side partial")
    assert(!p.contains("CollectLimit"))
  }

  test("minhash signatures (Md5, round-7 fused): pure projection like the xx64 family") {
    // the Md5 oracle parameterization now rides its own fused kernel —
    // same plan shape as production: per-row projection off the scan,
    // the null gate pushed down as the input filter
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8,
        family = HashFamily.Md5)
      .queryExecution.executedPlan.toString
    assert(p.contains("md5_minhash_sigs"), "fused Md5 expression missing from plan")
    assert(!p.contains("Exchange"), "fused signature stage must not shuffle")
    assert(!p.contains("HashAggregate"), "fused signature stage must not aggregate")
    assert(!p.contains("Generate"), "fused signature stage must not explode")
    assert(p.contains("PushedFilters: [IsNotNull(text)]"),
      "null gate should be the pushed-down input filter")
  }

  test("ta09 n-gram counts (round-7): ONE aggregation exchange, counted-gram explode") {
    // gram_counts emits per-doc counted triples, so the old
    // groupBy(doc, n, gram) exchange is gone: exactly one Generate (the
    // explode of counted rows) and exactly one Exchange (the final
    // (n, gram) aggregate), map-side-combined
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.pipeline.TextAnalysis.ngramCounts(docs, "doc_id", "text",
        maxN = 3, minCount = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("gram_counts"), "fused kernel missing from plan")
    assert("Generate ".r.findAllIn(p).size == 1,
      s"expected exactly one explode in:\n${p.take(3000)}")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange in:\n${p.take(3000)}")
    assert(p.contains("partial_"), "cf/df must combine map-side")
  }

  test("lshTopK signature stage (round-7): fused hyperplane kernel, no per-bit aggregates") {
    // all nTables signatures from one hyperplane_sigs pass — the only
    // Generates are the two posexplodes (corpus + query side), and the
    // stage carries no aggregation below the ranking windows
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = graft.pipeline.Similarity.lshTopK(
        e, e.limit(5), "vec_id", "embedding", k = 3, nBits = 4, nTables = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("hyperplane_sigs"), "fused kernel missing from plan")
    assert(!p.contains("zip_with") && !p.contains("aggregate("),
      "per-bit interpreted HOF chains should be gone")
  }

  test("simhash signatures (xx64): pure projection, zero exchanges/aggregates") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = Dedup.simhash(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("simhash64"), "fused expression missing from plan")
    assert(!p.contains("Exchange"), "fused signature stage must not shuffle")
    assert(!p.contains("HashAggregate"), "fused signature stage must not aggregate")
    assert(!p.contains("Generate"), "fused signature stage must not explode")
    assert("simhash64\\(".r.findAllIn(p).size <= 2, // Project + one Filter echo
      s"simhash64 evaluated more than twice:\n$p")
  }

  test("ANN final ranking is two-phase salted (no full-candidate window partition)") {
    val p = plan("ann01_topk_bruteforce")
    assert("row_number".r.findAllIn(p).size >= 2,
      "expected salted phase-1 + final phase-2 ranking")
    assert(p.contains("xxhash64"), "phase-1 partition key must carry the salt")
  }

  test("ta05 repetition signals: ONE corpus explode, partial-agg levels") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = graft.pipeline.TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the single-scan rewrite's invariant: all n-gram sizes ride one
    // tagged explode (one Generate), not one scan per n
    assert("Generate ".r.findAllIn(p).size == 1,
      s"expected exactly one explode in:\n${p.take(3000)}")
    assert(p.contains("partial_"), "gram counts must combine map-side")
  }

  test("pipe08 mixture: the only SinglePartition exchange sits above the strata aggregate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.pipeline.Curation.mixtureTable(docs, "text", Seq("lang", "source"))
      .queryExecution.executedPlan
    val single = plan.toString.linesIterator
      .filter(_.contains("SinglePartition")).toSeq
    assert(single.nonEmpty, "whole-frame fraction window expected")
    // the corpus-side aggregate below it must still be hash-partitioned
    assert(plan.toString.contains("hashpartitioning"),
      "per-stratum aggregate must shuffle by stratum, not gather")
  }

  test("whole-stage codegen covers the relational hot paths") {
    // AQE finalizes the plan only on execution — run it, then inspect
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages print as "*(n) Operator" in the final AQE plan
    assert(p.contains("*(") || p.contains("WholeStageCodegen"),
      s"q01 fell out of codegen:\n$p")
  }
}

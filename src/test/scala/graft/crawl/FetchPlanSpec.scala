package graft.crawl

import graft.SparkTestSession
import graft.fixtures.SyntheticCorpus
import graft.model.CrawlConfig
import graft.store.SnapshotStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale property of the fetch join (round-6): the corpus side is
  * hash-partitioned on `doc_id` ONCE per crawl (CrawlLoop.corpusState)
  * and every round's equi-join reuses that partitioning — so the plan
  * must show exactly ONE exchange (the politeness-bounded schedule
  * side), a shuffled-hash join BUILT from the schedule, and a cached
  * corpus scan with NO exchange and NO sort above it. This is the
  * steady-state (round ≥ 2) shape: without it, every round re-shuffled
  * (and the unhinted sort-merge plan re-sorted) the fat spans side —
  * the ~60 GB/run shuffle-read allocation the round-5 plan audit
  * attributed as the dominant remaining cost.
  */
class FetchPlanSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def collectNodes[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
    p.collect(f)

  test("fetch join: zero corpus-side exchange, schedule-side build, no sorts") {
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-fetchplan").toString
      val store = new SnapshotStore(dir, spark)
      val loop = new CrawlLoop(store, CrawlConfig())
      val corpus = SyntheticCorpus.docsLocal(20).toDS().toDF()
      val (corpusPart, _) = loop.corpusState(corpus)
      corpusPart.count() // materialize the once-per-crawl layout

      // the production construction: pruned cached corpus ⋈ schedule
      val fetchIn = SyntheticCorpus.docsLocal(20).toDS().toDF()
        .select($"doc_id".as("url"))
        .withColumn("host", org.apache.spark.sql.functions.lit("h"))
        .withColumn("depth", org.apache.spark.sql.functions.lit(0))
        .withColumn("priority", org.apache.spark.sql.functions.lit(2))
        .withColumn("retries", org.apache.spark.sql.functions.lit(0))
        .localCheckpoint()
      val corpusPruned = corpusPart.filter($"doc_id".startsWith("http://"))
      val joined = Round.fetchJoin(fetchIn, corpusPruned)
      val plan = joined.queryExecution.executedPlan

      val shj = collectNodes(plan) { case j: ShuffledHashJoinExec => j }
      assert(shj.size == 1, s"expected one shuffled-hash join:\n$plan")
      assert(shj.head.buildSide.toString == "BuildLeft",
        s"build side must be the (small) schedule:\n$plan")

      val exchanges = collectNodes(plan) { case e: ShuffleExchangeExec => e }
      assert(exchanges.size == 1,
        s"expected exactly one exchange (schedule side only):\n$plan")

      // the corpus (stream) side: cached scan, no exchange, no sort
      val streamSide = shj.head.right
      assert(collectNodes(streamSide) { case e: ShuffleExchangeExec => e }.isEmpty,
        s"corpus side must reuse the once-per-crawl partitioning:\n$plan")
      assert(collectNodes(streamSide) { case s: InMemoryTableScanExec => s }.nonEmpty,
        s"corpus side must read the persisted layout:\n$plan")
      assert(collectNodes(plan) {
        case s: org.apache.spark.sql.execution.SortExec => s
      }.isEmpty, s"shuffled-hash join must not sort either side:\n$plan")

      // and the exchange that IS there hangs off the schedule side
      assert(collectNodes(shj.head.left) { case e: ShuffleExchangeExec => e }.size == 1)
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}

package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs at sf0.001 and (where it should)
  * returns rows; every oracle key exists in queries; flagship non-empty.
  */
class QueriesSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  // queries whose correct result CAN be empty at tiny scale
  private val mayBeEmpty = Set(
    "dd03_minhash_lsh_pairs", "dd04_simhash_pairs", "dd06_embed_neardups",
    "q05_anti_join", "q11_group_having", "crawl07_clones", "crawl08_transitions")

  test("oracle keys ⊆ query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

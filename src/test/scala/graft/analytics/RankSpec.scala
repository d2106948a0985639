package graft.analytics

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class RankSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** local reference PageRank: dense double-loop, same fixed-iteration
    * damped formulation with uniform dangling redistribution.
    */
  private def reference(
      edges: Seq[(String, String)], damping: Double, iters: Int): Map[String, Double] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = dedup.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).size }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val inMass = dedup.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / out(s) }.sum
      }
      rank = nodes.map(v => v ->
        ((1.0 - damping) / n +
          damping * (inMass.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    rank
  }

  test("pageRank equals the dense reference on a graph with a dangling node and a hub") {
    // a ↔ b, both → hub c; c has NO out-links (dangling); d → c as well
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("b", "c"), ("d", "c"))
    val got = Rank.pageRank(edges.toDF("src_host", "dst_host"), 0.85, 10)
      .as[(String, Double)].collect().toMap
    val want = reference(edges, 0.85, 10)
    assert(got.keySet == want.keySet)
    got.foreach { case (h, r) =>
      assert(math.abs(r - want(h)) < 1e-12, s"host $h: got $r want ${want(h)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "probability mass must be conserved")
    assert(got("c") == got.values.max, "the sink hub must rank highest")
  }

  test("pageRank is independent of input partitioning and duplicate edges") {
    val edges = (0 until 40).map(k => (s"h${k % 8}", s"h${(k * 3 + 1) % 8}"))
    val base = Rank.pageRank(edges.toDF("src_host", "dst_host"))
      .as[(String, Double)].collect().toMap
    val shuffled = Rank.pageRank(
      (edges ++ edges).reverse.toDF("src_host", "dst_host").repartition(13))
      .as[(String, Double)].collect().toMap
    assert(base == shuffled)
  }
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-importance ranking over the crawl's committed link graph —
  * standard damped PageRank (Brin & Page 1998), fixed iteration count
  * so the result is DETERMINISTIC and replayable (no float-tolerance
  * convergence test whose trip point could vary with partitioning).
  *
  * Scale shape per iteration (the classic join-agg formulation):
  *   - contributions = edges ⋈ ranks on src (equi shuffle join on the
  *     scale-out key) → groupBy dst with partial aggregation;
  *   - dangling mass (rank parked on hosts with no out-links) is ONE
  *     scalar aggregate, redistributed uniformly — without it the
  *     probability mass leaks and ranks are wrong on any real web graph
  *     (the spec asserts Σrank = 1 at every iteration);
  *   - `localCheckpoint` truncates lineage each iteration, the same
  *     guard the crawl loop and connectedComponents use.
  * Driver data per iteration: two scalars (node count is computed once,
  * dangling mass per round). Nothing per-node ever collects.
  */
object Rank {

  /** edges: (src_host, dst_host) distinct directed host-level links.
    * Returns (host, rank), Σrank = 1 over all hosts seen in the graph.
    */
  def pageRank(
      edges0: DataFrame, damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val edges = edges0
      .select(col("src_host").as("src"), col("dst_host").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()

    val nodes = edges.select(col("src").as("host"))
      .unionAll(edges.select(col("dst").as("host")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))

    val outDeg = edges.groupBy(col("src").as("host"))
      .agg(count(lit(1)).as("out_deg"))

    var ranks = nodes.withColumn("rank", lit(1.0 / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(outDeg, Seq("host"), "left")
      // rank parked on dangling hosts (no out-links) — one scalar
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = withDeg.filter(col("out_deg").isNotNull)
        .join(edges, col("host") === col("src"))
        .select(col("dst").as("host"), (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("host")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(contribs, Seq("host"), "left")
        .select(col("host"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("in_mass"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint()
      ranks.unpersist()
      ranks = next
    }
    ranks
  }
}

package graft.frontier

import graft.model.CrawlConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-domain politeness scheduler (SURVEY.md §3.5 W3 — the core
  * scheduling operator): each round a host may fetch at most
  *
  *   budget(host) = max(1, floor(roundWindow / crawl_delay(host)))
  *
  * URLs, picked in the normative total order
  * `(priority DESC, enqueue_seq ASC, url ASC)` (§6.1), further capped by
  * the lifetime per-domain page limit (F5).
  *
  * Skew: a hot domain can hold a large share of the frontier (the fixture
  * deliberately routes ~30% of links to one host). A single
  * `row_number() OVER (PARTITION BY host ...)` would sort that host's
  * whole frontier in one task. Since the kept set per host is bounded by
  * `budgetCap = max(1, floor(roundWindow / minDelay))`, we run a
  * TWO-PHASE top-k: rank within (host, salt) buckets first — salt =
  * `pmod(xxhash64(url), S)`, partition-count independent — keep ≤
  * budgetCap per bucket, then rank the ≤ S·budgetCap survivors per host.
  * Phase-1 output per host is tiny, so phase 2 never skews.
  */
object Politeness {

  val Order: Seq[org.apache.spark.sql.Column] =
    Seq(col("priority").desc, col("enqueue_seq").asc, col("url").asc)

  /** Input columns required: url, host, priority, enqueue_seq,
    * crawl_delay, pages_crawled. Returns only the SCHEDULED rows (callers
    * recover the carry-over set by anti-joining back on url).
    */
  def schedule(frontier: DataFrame, cfg: CrawlConfig, minDelaySec: Double = 1.0): DataFrame = {
    val budgetCap = math.max(1, math.floor(cfg.roundWindowSec / minDelaySec).toInt)
    // budget is clamped to budgetCap: the two-phase top-k is only exact
    // when phase 1 keeps >= perHostCap rows per host, so a robots-supplied
    // crawl_delay below minDelaySec must not push the budget past the
    // phase-1 cap (the effective floor on delay is minDelaySec).
    val budget = least(
      greatest(lit(1), floor(lit(cfg.roundWindowSec) / col("crawl_delay")).cast("int")),
      lit(budgetCap))
    val remaining = greatest(
      lit(0),
      lit(cfg.maxPagesPerDomain) - coalesce(col("pages_crawled"), lit(0)))
    val perHostCap = least(budget, remaining)

    val salted = frontier.withColumn(
      "_salt", pmod(xxhash64(col("url")), lit(cfg.saltBuckets)))
    val w1 = Window.partitionBy(col("host"), col("_salt")).orderBy(Order: _*)
    val pruned = salted
      .withColumn("_r1", row_number().over(w1))
      .filter(col("_r1") <= budgetCap)
      .drop("_r1", "_salt")

    val w2 = Window.partitionBy(col("host")).orderBy(Order: _*)
    pruned
      .withColumn("_slot", row_number().over(w2))
      .filter(col("_slot") <= perHostCap)
      .drop("_slot")
  }
}

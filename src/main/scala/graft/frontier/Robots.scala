package graft.frontier

import graft.model.{CrawlConfig, RobotsRule}
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt gate (SURVEY.md §3.2 F8 / §3.3 J4).
  *
  * Longest-prefix-wins allow/deny + per-host crawl_delay, resolved on the
  * MAP SIDE in both execution paths — the frontier is never shuffled by
  * the gate (a window/group formulation would shuffle 10^10 rows by url):
  *
  *   - small rule sets (the common case — the reference held per-host
  *     parsers in crawler memory): ONE driver collect per RUN (not per
  *     round) into a broadcast map probed by a UDF.
  *   - large rule sets (beyond what a driver map should hold): rules are
  *     pre-aggregated to one row per host (sorted prefix array), then
  *     BROADCAST-joined to the frontier; the longest matching prefix is
  *     picked with array higher-order functions — still zero frontier
  *     shuffle, no driver materialization of the rule set.
  *
  * The path is picked once per run by rule count (`prepare`); both are
  * semantically identical (RobotsSpec asserts row equality and plans).
  */
sealed trait RobotsGate extends Serializable {
  /** Adds `robots_allowed` + `crawl_delay` columns. */
  def apply(frontier: DataFrame): DataFrame
}

/** Small-rule-set path: broadcast map + UDF (map-side, no shuffle). */
final case class BroadcastMapGate(
    bc: org.apache.spark.broadcast.Broadcast[Map[String, Array[(String, Boolean, Double)]]],
    defaultDelay: Double) extends RobotsGate {
  def apply(frontier: DataFrame): DataFrame = {
    val rules = bc // local so the UDF closure captures only the broadcast
    val dd = defaultDelay
    val gateUdf = udf { (host: String, url: String) =>
      val path = Urls.pathOf(url)
      rules.value.get(host) match {
        case None => (true, dd)
        case Some(rs) =>
          rs.find { case (prefix, _, _) => path.startsWith(prefix) } match {
            case Some((_, allow, delay)) => (allow, if (delay > 0) delay else dd)
            case None                    => (true, dd)
          }
      }
    }
    frontier
      .withColumn("_gate", gateUdf(col("host"), col("url")))
      .withColumn("robots_allowed", col("_gate._1"))
      .withColumn("crawl_delay", col("_gate._2"))
      .drop("_gate")
  }
}

/** Large-rule-set path: per-host sorted rule arrays joined to the
  * frontier; longest matching prefix via array higher-order functions.
  * Two regimes on the SAME plan shape (semantically identical, RobotsSpec
  * asserts row equality):
  *
  *   - `broadcastSide = true` (hosts fit an executor broadcast): the rule
  *     table broadcasts — map-side, zero frontier shuffle.
  *   - `broadcastSide = false` (host count above the broadcast bound — a
  *     rule set too big for a driver map is eventually too big for an
  *     8 GB broadcast too): SHUFFLE_HASH join on host. This is the ONE
  *     gate regime that shuffles the frontier; the cost is explicit and
  *     chosen only when the alternative is an executor-OOM-scale
  *     broadcast. The frontier shuffle is on `host` — the same key the
  *     politeness schedule partitions by downstream.
  */
final case class JoinGate(
    perHost: DataFrame, defaultDelay: Double,
    broadcastSide: Boolean = true) extends RobotsGate {
  def apply(frontier: DataFrame): DataFrame = {
    val path = graft.functions.UrlExpressions.url_path(col("url"))
    val hit = element_at(
      filter(col("_rules"), r => path.startsWith(r.getField("prefix"))), 1)
    val ruleSide = if (broadcastSide) broadcast(perHost) else perHost.hint("shuffle_hash")
    frontier
      .join(ruleSide, Seq("host"), "left")
      .withColumn("robots_allowed", coalesce(hit.getField("allow"), lit(true)))
      .withColumn("crawl_delay",
        when(hit.getField("delay") > 0, hit.getField("delay"))
          .otherwise(lit(defaultDelay)))
      .drop("_rules")
  }
}

object Robots {

  /** Resolve the gate ONCE per run, three regimes by measured size:
    * ≤ `maxBroadcastRules` rules → driver map broadcast (zero shuffle);
    * above it, ≤ `maxBroadcastHosts` per-host rows → broadcast join
    * (zero frontier shuffle); above THAT → shuffle-hash join on host
    * (the only regime that shuffles the frontier — see JoinGate). The
    * host default (2^22 rows of host + rule array) keeps the broadcast
    * comfortably under executor-memory scale before the shuffle regime
    * engages.
    */
  def prepare(
      rules: Dataset[RobotsRule],
      cfg: CrawlConfig,
      maxBroadcastRules: Long = 1L << 20,
      maxBroadcastHosts: Long = 1L << 22)(implicit spark: SparkSession): RobotsGate =
    if (rules.count() <= maxBroadcastRules) prepareBroadcastMap(rules, cfg)
    else prepareJoin(rules, cfg, maxBroadcastHosts)

  /** Duplicate identical (host, path_prefix) rules would otherwise be
    * tie-broken differently by the two paths' sort keys (map: prefix asc;
    * join: prefix desc within equal length — harmless across DISTINCT
    * prefixes, since equal-length distinct prefixes can never both match
    * one path, but semantics-breaking for true duplicates). Resolve them
    * BEFORE either path with one deterministic rule — most restrictive
    * wins: allow = AND of duplicates, crawl_delay = max.
    */
  private def dedupPerPrefix(rules: Dataset[RobotsRule]): Dataset[RobotsRule] = {
    import rules.sparkSession.implicits._
    rules.toDF()
      .groupBy(col("host"), col("path_prefix"))
      .agg(min(col("allow")).as("allow"), max(col("crawl_delay")).as("crawl_delay"))
      .as[RobotsRule]
  }

  /** Small path: host -> rules sorted by (prefix length desc, prefix asc). */
  def prepareBroadcastMap(
      rules: Dataset[RobotsRule],
      cfg: CrawlConfig)(implicit spark: SparkSession): RobotsGate = {
    val byHost: Map[String, Array[(String, Boolean, Double)]] =
      rules.collect()
        .groupBy(_.host)
        .map { case (h, rs) =>
          h -> rs.groupBy(_.path_prefix).map { case (p, dups) =>
            // same winner as dedupPerPrefix, resolved driver-side (no
            // extra Spark job on the already-collected small rule set)
            (p, dups.forall(_.allow), dups.map(_.crawl_delay).max)
          }.toArray.sortBy { case (p, _, _) => (-p.length, p) }
        }
    BroadcastMapGate(spark.sparkContext.broadcast(byHost), cfg.defaultCrawlDelaySec)
  }

  /** Scale path: per-host sorted rule arrays (len desc), no collect,
    * cached for the whole run. The host count (one job over the
    * about-to-be-reused cache) picks broadcast vs shuffle-hash — the
    * third regime's bound (see [[prepare]]).
    */
  def prepareJoin(
      rules: Dataset[RobotsRule],
      cfg: CrawlConfig,
      maxBroadcastHosts: Long = 1L << 22)(implicit spark: SparkSession): RobotsGate = {
    val perHost = dedupPerPrefix(rules).toDF()
      .groupBy(col("host"))
      .agg(reverse(array_sort(collect_list(struct(
        length(col("path_prefix")).as("len"),
        col("path_prefix").as("prefix"),
        col("allow").as("allow"),
        col("crawl_delay").as("delay"))))).as("_rules"))
      .persist()
    JoinGate(perHost, cfg.defaultCrawlDelaySec,
      broadcastSide = perHost.count() <= maxBroadcastHosts)
  }
}

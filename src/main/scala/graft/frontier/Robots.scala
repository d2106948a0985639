package graft.frontier

import graft.model.{CrawlConfig, RobotsRule}
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** robots.txt gate (SURVEY.md §3.2 F8 / §3.3 J4).
  *
  * Longest-prefix-wins allow/deny + per-host crawl_delay. The rule set is
  * O(#hosts × few rules) — the reference held it as in-memory per-host
  * parsers (`RobotsTxtMiddleware`), so the scale-correct Spark shape is a
  * BROADCAST map resolved on the map side: zero shuffle, stays inside the
  * scan's codegen stage. (A window/group alternative would shuffle the
  * whole frontier by url — wrong at 10^10 rows.)
  */
object Robots {

  /** (allow, crawl_delay) resolved per (host, path); absent host ⇒
    * allow-all with the default delay.
    */
  def gate(
      frontier: DataFrame,
      rules: Dataset[RobotsRule],
      cfg: CrawlConfig)(implicit spark: SparkSession): DataFrame = {
    // host -> rules sorted by descending prefix length (longest wins)
    val byHost: Map[String, Array[(String, Boolean, Double)]] =
      rules.collect()
        .groupBy(_.host)
        .map { case (h, rs) =>
          h -> rs.map(r => (r.path_prefix, r.allow, r.crawl_delay))
            .sortBy(-_._1.length)
        }
    val bc = spark.sparkContext.broadcast(byHost)
    val defaultDelay = cfg.defaultCrawlDelaySec

    val gateUdf = udf { (host: String, url: String) =>
      val path = Urls.pathOf(url)
      bc.value.get(host) match {
        case None => (true, defaultDelay)
        case Some(rs) =>
          rs.find { case (prefix, _, _) => path.startsWith(prefix) } match {
            case Some((_, allow, delay)) =>
              (allow, if (delay > 0) delay else defaultDelay)
            case None => (true, defaultDelay)
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

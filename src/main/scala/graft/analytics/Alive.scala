package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alive/dead status analytics (SURVEY.md §3.5 W4 — the reference's isup
  * cron script compared the previous check with the current one; here a
  * lag window over per-round fetch outcomes).
  */
object Alive {

  /** Per (host, round) up-ness derived from that round's fetch statuses:
    * any 2xx/4xx HTTP response = host up (a response means the service
    * answered); connection failure (status 0) only = down.
    */
  def hostRoundStatus(pages: DataFrame): DataFrame =
    pages.groupBy(col("host"), col("visited_round").as("round"))
      .agg(max(when(col("status") > 0, 1).otherwise(0)).as("up_now"))

  /** Status-transition detection: lag(up) per host over rounds; emits
    * went_up / went_down edges.
    */
  def transitions(pages: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("host")).orderBy(col("round"))
    hostRoundStatus(pages)
      .withColumn("up_prev", lag(col("up_now"), 1).over(w))
      .filter(col("up_prev").isNotNull && col("up_prev") =!= col("up_now"))
      .select(col("host"), col("round"),
        when(col("up_now") === 1, lit("went_up"))
          .otherwise(lit("went_down")).as("transition"))
  }

  /** The alive-hosts export (K4): currently-up, non-junk, non-fake. */
  def aliveExport(domains: DataFrame): DataFrame =
    domains.filter(col("is_up") && !col("is_crap") && !col("is_fake"))
      .select(col("host")).orderBy(col("host"))
}

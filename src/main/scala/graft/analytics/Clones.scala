package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clone / "fake" detection (SURVEY.md §3.3 J6 + §3.4 A5/A6 — the
  * reference's maintenance script groups domains by identical front-page
  * content hash, marks all but one as fakes, and picks the genuine one as
  * the earliest-seen).
  *
  * Group-having + arg-min expressed as ONE hash aggregation — no
  * self-join: `min_by` picks the genuine host per content group in the
  * same pass that counts the group, then a single explode emits the fake
  * rows. (The naive self-join on content_sha1 is quadratic in clone-group
  * size; the aggregate is linear and map-side partial.)
  */
object Clones {

  /** `frontPages`: (host, content_sha1); `domains`: needs (host,
    * first_seen_round). Returns (host, is_fake, genuine_host) for every
    * host in a >1-sized identical-content group.
    */
  def detect(frontPages: DataFrame, domains: DataFrame): DataFrame = {
    val withSeen = frontPages
      .join(domains.select(col("host"), col("first_seen_round")), Seq("host"), "left")
      .na.fill(Map("first_seen_round" -> Int.MaxValue))

    withSeen
      .groupBy(col("content_sha1"))
      .agg(
        collect_set(col("host")).as("hosts"),
        min_by(col("host"), struct(col("first_seen_round"), col("host"))).as("genuine_host"))
      .filter(size(col("hosts")) > 1)
      .select(explode(col("hosts")).as("host"), col("genuine_host"))
      .select(
        col("host"),
        (col("host") =!= col("genuine_host")).as("is_fake"),
        col("genuine_host"))
  }
}

package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted lookups + link-graph views (SURVEY.md §3.3 J5/J7 — the
  * reference's Flask/API pages: domains by email / BTC address, link
  * neighbors of a host).
  */
object Lookups {

  /** Hosts that published `value` in fact table `facts(host,value,round)`. */
  def domainsByFact(domains: DataFrame, facts: DataFrame, value: String): DataFrame =
    domains.join(
      facts.filter(col("value") === value).select("host").distinct(),
      Seq("host"), "left_semi")

  /** Most-referenced fact values with their distinct host counts —
    * the API's "top emails / btc addresses" listing.
    */
  def topFacts(facts: DataFrame, k: Int): DataFrame =
    facts.groupBy(col("value"))
      .agg(countDistinct(col("host")).as("n_hosts"))
      .orderBy(col("n_hosts").desc, col("value").asc)
      .limit(k)

  /** Clone-evidence tie-in (J7 over `ssh_fps` + A6's "matching SSH fp"
    * rule): fingerprints shared by more than one host — reused
    * infrastructure — with each sharing host's clone marking, so a shared
    * host key corroborates the content-based `is_fake` flags.
    */
  def sharedInfrastructure(sshFps: DataFrame, domains: DataFrame): DataFrame =
    sshFps.groupBy(col("value").as("ssh_fp"))
      .agg(sort_array(collect_set(col("host"))).as("hosts"))
      .filter(size(col("hosts")) > 1)
      .select(col("ssh_fp"), explode(col("hosts")).as("host"))
      .join(domains.select(col("host"), col("is_fake"), col("genuine_host")),
        Seq("host"), "left")
      .select("ssh_fp", "host", "is_fake", "genuine_host")

  /** In/out link degree per host (link-graph neighbor summary). */
  def linkDegrees(links: DataFrame): DataFrame = {
    val out = links.groupBy(col("src_host").as("host"))
      .agg(countDistinct(col("dst_host")).as("out_degree"))
    val in = links.groupBy(col("dst_host").as("host"))
      .agg(countDistinct(col("src_host")).as("in_degree"))
    out.join(in, Seq("host"), "full_outer").na.fill(0L)
  }

  /** Hosts linking TO `host` and hosts linked FROM it (domain page). */
  def neighbors(links: DataFrame, host: String): DataFrame = {
    val inN = links.filter(col("dst_host") === host)
      .select(col("src_host").as("neighbor")).distinct()
      .withColumn("direction", lit("in"))
    val outN = links.filter(col("src_host") === host)
      .select(col("dst_host").as("neighbor")).distinct()
      .withColumn("direction", lit("out"))
    inN.unionByName(outN)
  }
}

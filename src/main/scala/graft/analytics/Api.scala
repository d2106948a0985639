package graft.analytics

import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's Flask/JSON API surface re-expressed (SURVEY.md §4.2):
  * snapshot tables registered as temp views so `spark.sql(...)` is a
  * first-class entry point (same Catalyst path as the DataFrame API),
  * plus JSON projections (K3) for the entity endpoints.
  */
object Api {

  val Tables = Seq("frontier", "seen", "domains", "pages", "pages_fts",
    "links", "media_refs", "emails", "btc_addresses", "ssh_fps", "open_ports",
    "robots_rules", "crawl_log", "metrics")

  /** Register every committed table as a temp view (`graft_<table>`). */
  def registerViews(store: SnapshotStore, spark: SparkSession): Unit =
    Tables.foreach { t =>
      store.read(t).createOrReplaceTempView(s"graft_$t")
    }

  /** SQL entry point — parse → analyze → optimize → execute, identical
    * Catalyst path to the typed API.
    */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)

  /** Domain-detail endpoint: one JSON document per host (K3). */
  def domainJson(domains: DataFrame): DataFrame =
    domains.select(col("host"), to_json(struct(domains.columns.map(col): _*)).as("json"))

  /** Search-result endpoint: rows → JSON lines. */
  def asJsonLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("json"))
}

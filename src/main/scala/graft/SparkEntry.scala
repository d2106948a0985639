package graft

import graft.queries.{CrawlQueries, Oracles, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` assembles three groups:
  *   - crawl engine (frontier/politeness/dedup/analytics over the
  *     deterministic synthetic span corpus) — rows-only checks, semantics
  *     pinned by CrawlSpec goldens/properties;
  *   - relational operator coverage over the driver testdata — each with
  *     a DuckDB oracle in `oracleSql`;
  *   - training-pipeline ops (dedup / ANN / text analysis / multimodal) —
  *     DuckDB oracles where SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the golden crawl log of a multi-round crawl over the
    * interleaved text+media span corpus. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    CrawlQueries.all("crawl01_log")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ PipelineQueries.all ++ CrawlQueries.all

  /** DuckDB twins for every SQL-expressible query (same column names,
    * same decimal casts, same ordering — see Oracles scaladoc).
    */
  def oracleSql: Map[String, String] = Oracles.all
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text search (SURVEY.md §3.8 — the reference's Elasticsearch
  * surface re-expressed relationally): tokenize at index time into an
  * inverted term table; a query is a semi-join on its terms with
  * matched-term count (title hits boosted) as the score, then
  * deterministic pagination.
  */
object Search {

  /** `array_distinct(filter(split(lower(text), "\\W+"), length > 1))`,
    * executed by the native single-scan [[graft.functions.FastTerms]]
    * expression (equivalence property-tested in FastScanSpec).
    */
  def tokenize(text: Column): Column =
    graft.functions.TextExpressions.fast_terms(text)

  /** RAW index postings over crawled pages + their corpus text:
    * (term, url, host, in_title) — NOT deduplicated. The crawl loop calls
    * this per round on the round's fetched pages + Bloom-pruned corpus
    * slice and APPENDS the result to the committed `pages_fts` table (K2,
    * the ES index the reference maintained incrementally per crawl).
    * Deliberately NO groupBy here: postings flow map-side (explode only)
    * straight into the loop's combined partitioned write, adding ZERO
    * shuffle to the crawl hot path — a per-round (term,url) dedup shuffle
    * over every token of every fetched document was measured at ~35% of
    * whole-crawl throughput at bench scale. Duplicates (a title term also
    * in the body; recrawls across rounds) cost a few % of index size and
    * are collapsed by [[query]] AFTER its term filter, where the input is
    * tiny.
    */
  def indexPostings(pages: DataFrame, corpus: DataFrame): DataFrame = {
    val body = corpus.select(
      col("doc_id").as("url"),
      array_join(transform(
        filter(col("spans"), s => s.getField("kind") === "text"),
        s => s.getField("text")), " ").as("body"))
    val joined = pages.filter(col("status") === 200)
      .select(col("url"), col("host"), col("title"))
      .join(body, Seq("url"), "left")
    val titleTerms = joined.select(col("url"), col("host"),
      explode(tokenize(col("title"))).as("term"), lit(true).as("in_title"))
    val bodyTerms = joined.select(col("url"), col("host"),
      explode(tokenize(coalesce(col("body"), lit("")))).as("term"),
      lit(false).as("in_title"))
    titleTerms.unionByName(bodyTerms)
      .select(col("term"), col("url"), col("host"), col("in_title"))
  }

  /** One-shot deduplicated inverted index (ad-hoc corpora / the
    * equivalence tests): [[indexPostings]] collapsed to unique
    * (term, url, host) rows.
    */
  def buildIndex(pages: DataFrame, corpus: DataFrame): DataFrame =
    indexPostings(pages, corpus)
      .groupBy("term", "url", "host")
      .agg(max(col("in_title")).as("in_title"))

  /** multi_match-style query: score = matched distinct terms, title
    * matches boosted 2×; page/pageSize = ES from/size (W2 pagination).
    *
    * Pagination is TOP-K, not a global window: `orderBy.limit(n)` plans
    * as TakeOrderedAndProject — every partition keeps its local top
    * `(page+1)*pageSize` rows and only those reach the driver-side
    * merge. (A `row_number() OVER (ORDER BY ...)` would sort the entire
    * hit set in one task.) The residual window ranks only the ≤ n
    * surviving rows.
    */
  def query(
      index: DataFrame, q: String,
      page: Int = 0, pageSize: Int = 10): DataFrame = {
    val terms = q.toLowerCase.split("\\W+").filter(_.length > 1).distinct.toSeq
    if (terms.isEmpty) return index.sparkSession.emptyDataFrame
    val hits = index
      .filter(col("term").isin(terms: _*))
      // the COMMITTED index accumulates per-round deltas, so a recrawled
      // page may carry duplicate (term, url) rows across rounds — dedup
      // AFTER the term filter (the agg runs over the tiny hit set, and
      // the term predicate pushes down to the scan), making query results
      // identical over a freshly-built or delta-accumulated index
      .groupBy(col("term"), col("url"), col("host"))
      .agg(max(col("in_title")).as("in_title"))
      .groupBy(col("url"), col("host"))
      .agg(
        countDistinct(col("term")).as("matched"),
        sum(when(col("in_title"), 1).otherwise(0)).as("title_hits"))
      .withColumn("score", col("matched") + lit(2) * col("title_hits"))
    val n = (page + 1) * pageSize
    val topN = hits.orderBy(col("score").desc, col("url").asc).limit(n)
    val w = Window.orderBy(col("score").desc, col("url").asc)
    topN
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > page * pageSize)
      .select(col("rn").as("rank"), col("url"), col("host"), col("score"),
        col("matched"), col("title_hits"))
  }
}

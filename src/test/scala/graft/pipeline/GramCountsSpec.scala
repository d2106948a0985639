package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-7 fused per-doc gram-count kernel (GramCounts) and every
  * operator reshaped onto it (ta05 repetition / ta06 vocab / ta08
  * TF-IDF / ta09 n-gram counts) must reproduce their per-occurrence
  * compositions EXACTLY — the compositions stay in TextAnalysis as
  * executable specs (`*Composed`), and the ta05/ta06/ta08/ta09 DuckDB
  * oracles pin the values cross-engine.
  */
class GramCountsSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def adversarial(seed: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 1200).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "...", "one", "one two", "one two three",
      "a a a a a", "x_1 x_1 x_1 y", "é K upper TEST lower",
      "AAA bbb AAA bbb AAA", "rep rep rep rep", "İstanbul K-9",
      ("tok " * 120).trim)
    random ++ edges
  }

  private def docsOf(cases: Seq[String]) =
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("gram_counts kernel equals the tagged per-occurrence composition") {
    val df = docsOf(adversarial(31))
    val ns = Seq(1, 2, 3, 5)
    // fused: per-doc counted triples
    val got = df.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(TextAnalysis.gramCounts(col("text"), ns)).as("t"))
      .select(col("doc_id"), col("t.n"), col("t.gram"), col("t.c"))
      .as[(Long, Int, String, Long)].collect().toSeq.sorted
    // composition: count the exploded occurrences per (doc, n, gram)
    val want = df
      .select(col("doc_id"), Dedup.tokenSeq(col("text")).as("tk"))
      .select(col("doc_id"), explode(flatten(array(ns.map(n =>
        transform(TextAnalysis.ngrams(col("tk"), n),
          g => struct(lit(n).as("n"), g.as("g")))): _*))).as("t"))
      .groupBy(col("doc_id"), col("t.n").as("n"), col("t.g").as("gram"))
      .agg(count(lit(1)).as("c"))
      .as[(Long, Int, String, Long)].collect().toSeq.sorted
    assert(got == want)
  }

  test("ta09 ngramCounts fused equals composed") {
    val df = docsOf(adversarial(37))
    val got = TextAnalysis.ngramCounts(df, "doc_id", "text", maxN = 3, minCount = 2)
      .as[(Int, String, Long, Long)].collect().toSeq.sorted
    val want = TextAnalysis.ngramCountsComposed(df, "doc_id", "text", maxN = 3, minCount = 2)
      .as[(Int, String, Long, Long)].collect().toSeq.sorted
    assert(got == want)
  }

  test("ta05 repetitionSignals fused equals composed") {
    val df = docsOf(adversarial(41))
    val got = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq.sorted
    val want = TextAnalysis.repetitionSignalsComposed(df, "doc_id", "text")
      .as[(Long, Double, Double, Double, Double)].collect().toSeq.sorted
    assert(got == want)
  }

  test("ta06 vocabTopK fused equals composed") {
    val df = docsOf(adversarial(43))
    val got = TextAnalysis.vocabTopK(df, "doc_id", "text", k = 30)
      .as[(String, Long, Long)].collect().toSeq
    val want = TextAnalysis.vocabTopKComposed(df, "doc_id", "text", k = 30)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("ta08 tfidfTopTerms fused equals composed") {
    val df = docsOf(adversarial(47))
    val got = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 5)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq.sorted
    val want = TextAnalysis.tfidfTopTermsComposed(df, "doc_id", "text", k = 5)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq.sorted
    assert(got == want)
  }
}

package graft.fixtures

import graft.SparkTestSession
import graft.extract.SpanExtract
import graft.model.{Doc, Span}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The per-row invariant from BASELINE.json input_hint: span-sequence
  * equality on (kind, text, media_ref, order) — preserved through parquet
  * round-trips and explode + re-sort (SURVEY.md §7 per-row tier).
  */
class SpanInvariantSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  val nHosts = 12
  lazy val docs: Seq[Doc] = SyntheticCorpus.docsLocal(nHosts)

  test("generator: offsets strictly increasing per row; kind/text/media_ref consistent") {
    docs.foreach { d =>
      val offs = d.spans.map(_.offset)
      assert(offs == offs.sorted && offs.distinct == offs, s"offsets broken in ${d.doc_id}")
      d.spans.foreach { s =>
        if (s.kind == "text" || s.kind == "header")
          assert(s.text != null && s.media_ref == null)
        else { assert(s.kind == "media" && s.media_ref != null && s.text == null) }
      }
    }
  }

  test("parquet round-trip preserves span sequences exactly") {
    val dir = Files.createTempDirectory("corpus").toString + "/docs"
    docs.toDS().toDF().repartition(5).write.parquet(dir)
    val back = spark.read.parquet(dir).as[Doc].collect()
      .map(d => d.doc_id -> d.spans).toMap
    docs.foreach { d =>
      assert(back(d.doc_id).map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)),
        s"span sequence drift for ${d.doc_id}")
    }
  }

  test("explode + shuffle + re-sort by offset reconstructs the exact sequence") {
    val exploded = docs.toDS().toDF()
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .repartition(7, col("s.offset")) // deliberately scramble row order
    val rebuilt = exploded
      .groupBy("doc_id")
      .agg(collect_list(col("s")).as("spans")) // arrival order scrambled
      .as[Doc].collect().map(d => d.doc_id -> d.spans).toMap
    docs.foreach { d =>
      val got = SpanExtract.ordered(rebuilt(d.doc_id))
      assert(got.map(s => (s.kind, s.text, s.media_ref, s.offset)) ==
        d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset)))
    }
  }

  test("deterministic regeneration: same inputs, same corpus") {
    assert(SyntheticCorpus.docsLocal(nHosts) == docs)
  }
}

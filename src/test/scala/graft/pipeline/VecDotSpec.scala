package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused dot-product kernel (graft.functions.DotProduct, round 7)
  * must reproduce the interpreted zip_with+aggregate composition
  * BIT-IDENTICALLY — including the left-fold accumulation order (IEEE
  * doubles are order-sensitive) and the null semantics (null array,
  * length mismatch, null element ⇒ null). The composition stays as
  * `Similarity.dotComposed`, the executable spec.
  */
class VecDotSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("fused dot equals the composition bit-for-bit on random float vectors") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 500).map { i =>
      val n = if (i % 7 == 0) rnd.nextInt(5) else 64
      (Seq.fill(n)(rnd.nextFloat() * 2 - 1), Seq.fill(n)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("u", "v")
      .select(col("u").cast("array<float>").as("u"), col("v").cast("array<float>").as("v"))
    val got = df.select(Similarity.dot(col("u"), col("v"))).as[Double].collect().toSeq
    val want = df.select(Similarity.dotComposed(col("u"), col("v"))).as[Double].collect().toSeq
    got.lazyZip(want).foreach { (g, w) =>
      assert(java.lang.Double.doubleToRawLongBits(g) ==
        java.lang.Double.doubleToRawLongBits(w))
    }
  }

  test("fused dot mirrors the composition's null semantics") {
    val df = Seq[(Seq[java.lang.Float], Seq[java.lang.Float])](
      (null, Seq(1.0f, 2.0f)),                       // null array
      (Seq(1.0f, 2.0f), Seq(1.0f)),                  // length mismatch
      (Seq(1.0f, null), Seq(1.0f, 2.0f)),            // null element
      (Seq.empty, Seq.empty),                        // both empty → 0.0
      (Seq(2.0f, 3.0f), Seq(4.0f, 5.0f)))            // plain
      .toDF("u", "v")
      .select(col("u").cast("array<float>").as("u"), col("v").cast("array<float>").as("v"))
    val got = df.select(Similarity.dot(col("u"), col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))).toSeq
    val want = df.select(Similarity.dotComposed(col("u"), col("v"))).collect().map(r =>
      if (r.isNullAt(0)) null else java.lang.Double.valueOf(r.getDouble(0))).toSeq
    assert(got == want)
    assert(got == Seq(null, null, null, java.lang.Double.valueOf(0.0),
      java.lang.Double.valueOf(23.0)))
  }

  test("fused dot equals the composition on mixed float/double arrays (centroid path)") {
    val rnd = new scala.util.Random(59)
    val rows = (0 until 200).map { _ =>
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("u", "v")
      .select(col("u").cast("array<float>").as("u"), col("v").cast("array<double>").as("v"))
    val got = df.select(Similarity.dot(col("u"), col("v"))).as[Double].collect().toSeq
    val want = df.select(Similarity.dotComposed(col("u"), col("v"))).as[Double].collect().toSeq
    got.lazyZip(want).foreach { (g, w) =>
      assert(java.lang.Double.doubleToRawLongBits(g) ==
        java.lang.Double.doubleToRawLongBits(w))
    }
  }

  test("pipe10 grouped reshape equals the self-join composition") {
    // rides here to keep the round-7 reshape specs together: the
    // collect_set-by-shingle form vs the distinct+self-join spec
    val rnd = new scala.util.Random(61)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    val docs = (0 until 300).map { i =>
      (s"src${i % 6}", (0 until 3 + rnd.nextInt(20)).map(_ =>
        words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("source", "text")
    val got = Curation.sourceOverlapMatrix(docs, "source", "text")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    val want = Curation.sourceOverlapMatrixComposed(docs, "source", "text")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == want)
  }
}

package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused multi-table hyperplane signature kernel (HyperplaneSigs,
  * round 7) must reproduce `Similarity.bandSignature`'s per-bit
  * composition EXACTLY for every table index and both hash families —
  * including the composition's null-swallowing semantics (null vector /
  * null element / empty vector → all-zero signature, NOT null). The
  * composition stays as the executable spec; the ann02/ann05/dd06
  * DuckDB oracles pin the Md5 values cross-engine.
  */
class HyperplaneSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def vecsDF(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows: Seq[(Long, Seq[java.lang.Float])] =
      (0L until 300L).map { id =>
        (id, Seq.fill(64)(java.lang.Float.valueOf(rnd.nextFloat() * 2 - 1)): Seq[java.lang.Float])
      } ++ Seq(
        (300L, null.asInstanceOf[Seq[java.lang.Float]]),            // null vector
        (301L, Seq.empty[java.lang.Float]),                         // empty vector
        (302L, Seq[java.lang.Float](1.0f, null, 0.5f)),             // null element
        (303L, Seq[java.lang.Float](0.0f, 0.0f)))                   // zero vector
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("fused hyperplane signatures equal the per-bit composition, both families") {
    val df = vecsDF(67)
    for (family <- Seq[HashFamily](HashFamily.XxHash64, HashFamily.Md5);
         nBits <- Seq(4, 6); nTables <- Seq(1, 3)) {
      val got = df.select(col("vec_id"),
          Similarity.hyperplaneSigs(col("embedding"), nBits, nTables, family).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = df.select(col("vec_id"),
          array((0 until nTables).map(t =>
            Similarity.bandSignature(col("embedding"), nBits, t, family)): _*).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (id, sigs) =>
        assert(sigs == want(id), s"family=$family nBits=$nBits nTables=$nTables vec_id=$id")
      }
    }
  }

  test("fused signatures equal the composition on the real embeddings table") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for (family <- Seq[HashFamily](HashFamily.XxHash64, HashFamily.Md5)) {
      val got = e.select(col("vec_id"),
          Similarity.hyperplaneSigs(col("embedding"), 6, 8, family).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = e.select(col("vec_id"),
          array((0 until 8).map(t =>
            Similarity.bandSignature(col("embedding"), 6, t, family)): _*).as("s"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got == want, s"family=$family")
    }
  }
}

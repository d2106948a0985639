package graft
import org.apache.spark.sql.functions._
object DD03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    import graft.pipeline.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $label ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    // warm
    Dedup.minhashSignatures(docs, "doc_id", "text").count()
    time("signatures")(Dedup.minhashSignatures(docs, "doc_id", "text").count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint()
    time("bands")(Dedup.lshBands(sigs, "doc_id", 16, 4).count())
    val bands = Dedup.lshBands(sigs, "doc_id", 16, 4).localCheckpoint()
    time("candidates")(Dedup.pairsFromBands(bands, "doc_id").count())
    val cands = Dedup.pairsFromBands(bands, "doc_id").localCheckpoint()
    time("verify")(Dedup.exactJaccard(docs, cands, "doc_id", "text").filter(col("jaccard") >= 0.3).count())
    time("verify_composed")(Dedup.exactJaccardComposed(docs, cands, "doc_id", "text")
      .filter(col("jaccard") >= 0.3).count())
    time("full")(Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.3).count())
  }
}

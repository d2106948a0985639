package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row for the opaque-media pipeline. */
final case class MediaRow(
    media_id: Long,
    payload: Array[Byte],
    format: String,
    width: Int,
    height: Int)

final case class MediaFeatures(
    media_id: Long,
    n_bytes: Int,
    payload_md5: String,
    feature: Seq[Float],
    batch_size: Int)

/** Multimodal columns: image/audio/video as opaque `binary` + typed
  * metadata, with decode / feature-extraction as partition-batched
  * functions (the Scala analogue of `mapInPandas`: one invocation per
  * batch of rows, amortizing model/codec setup).
  *
  * The actual codec is ########## STUBBED ##########: this container has
  * no image/audio libraries, so `decodeStub` produces a DETERMINISTIC
  * fake feature (seeded from the payload bytes). The Spark-side plumbing
  * — binary column, metadata struct, batch shape, partition-wise
  * execution — is real and tested; swap `decodeStub` for a JNI/ONNX call
  * in production.
  */
object Multimodal {

  /** Manufacture an opaque binary payload + metadata from a text corpus
    * (deterministic stand-in for real image bytes).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("png"), lit("jpeg"), lit("webp")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("format"),
      (pmod(xxhash64(col(textCol)), lit(512)) + 64).cast("int").as("width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(512)) + 64).cast("int").as("height"))

  /** ########## STUB ##########
    * Deterministic fake "decode + embed": 8 floats derived from byte
    * prefix sums. Replace with the real decoder; signature (an iterator
    * of row BATCHES in, iterator out) is the production shape.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def decodeStub(batch: Seq[MediaRow]): Seq[MediaFeatures] = {
    val bs = batch.size
    batch.map { m =>
      val feat = (0 until 8).map { j =>
        var acc = 1469598103934665603L // FNV basis, seeded per feature dim
        var i = j
        while (i < m.payload.length) { acc = (acc ^ m.payload(i)) * 1099511628211L; i += 8 }
        (acc % 1000003L).toFloat / 1000003f
      }
      MediaFeatures(
        media_id = m.media_id,
        n_bytes = m.payload.length,
        payload_md5 = { md5Local.get().reset()
          md5Local.get().digest(m.payload).map(b => f"${b & 0xff}%02x").mkString },
        feature = feat,
        batch_size = bs)
    }
  }

  /** Partition-batched feature extraction: each partition is processed in
    * batches of `batchSize` rows (the `mapInPandas` batch shape) so a
    * real decoder could amortize per-batch setup. Deterministic per row.
    */
  def extractFeatures(
      media: DataFrame, batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "payload", "format", "width", "height")
      .as[MediaRow]
      .mapPartitions(it => it.grouped(batchSize).flatMap(g => decodeStub(g.toSeq)))
  }
}

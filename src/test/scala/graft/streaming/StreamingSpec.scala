package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val eventsDir = {
    // stage the testdata events into a dir the file stream can list
    val d = Files.createTempDirectory("events-stream").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("streaming windowed counts == batch windowed counts on static input") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, eventsDir))
      .writeStream.outputMode("append").format("memory")
      .queryName("win_counts").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // watermark: append emits windows closed w.r.t. max(ts)-10min; compare
    // against the batch twin restricted to the same closed windows.
    // (timestamps collected as strings — the parquet ts is NTZ in Spark 4)
    val mx = spark.read.parquet(eventsDir)
      .agg(max(col("ts")).as("max_ts"))
    val streamed = spark.table("win_counts")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    val batch = EventStreams.windowedCountsBatch(spark.read.parquet(eventsDir))
      .crossJoin(mx)
      .filter(col("window_start") + expr("INTERVAL 5 minutes") <=
        col("max_ts") - expr("INTERVAL 10 minutes"))
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(batch.nonEmpty)
    assert(batch.subsetOf(streamed), s"missing windows: ${batch -- streamed}")
  }

  test("flatMapGroupsWithState sessionization emits per-user sessions on timeout") {
    val q = EventStreams.sessionize(
      EventStreams.readEvents(spark, eventsDir).as[Event])
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").trigger(Trigger.ProcessingTime("1 second")).start()
    // first micro-batch buffers state; an empty batch after the 30s
    // processing-time timeout flushes sessions — poke the source dir
    val deadline = System.currentTimeMillis() + 90000
    while (spark.table("sessions").isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(2000)
      // touch: write an empty-but-schema'd parquet to trigger batches
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        EventStreams.eventSchema).write.mode("append").parquet(eventsDir)
    }
    q.stop()
    val sessions = spark.table("sessions")
      .select("user_id", "n_events").as[(Long, Int)].collect()
    assert(sessions.nonEmpty, "no sessions emitted before deadline")
    val expected = spark.read.parquet(eventsDir).filter(col("event_id").isNotNull)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    sessions.foreach { case (u, n) => assert(n.toLong == expected(u)) }
  }
}

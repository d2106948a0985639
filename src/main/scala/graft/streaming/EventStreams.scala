package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class UserSession(
    user_id: Long, n_events: Int, total_value: Double,
    first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

/** Structured Streaming surface (SURVEY.md §3.9): the reference is a
  * single long-running event loop; the Spark-native equivalents are
  * micro-batch pipelines — `readStream` → watermarked event-time windows
  * → sink, and `flatMapGroupsWithState` for custom session state. The
  * crawl itself stays iterative-batch (T1) — these operators cover the
  * streaming column of the inventory and the `events` stream table.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a directory of event parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Watermarked tumbling-window counts per event type (T4/T5): late
    * data beyond 10 minutes is dropped; append mode emits finalized
    * windows only.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Batch twin of [[windowedCounts]] (same logical result on static
    * input, modulo watermark-dropped rows) — used to cross-check the
    * streaming output in tests and as the oracle-checkable form.
    */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Custom per-key state (T2-analogue): user sessionization with a
    * processing-time timeout via flatMapGroupsWithState.
    */
  def sessionize(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSession]) => {
          val evs = batch.toSeq
          if (evs.isEmpty && state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else if (evs.nonEmpty) {
            val sorted = evs.sortBy(_.ts.getTime)
            val prev = state.getOption
            val merged = UserSession(
              user_id = userId,
              n_events = prev.map(_.n_events).getOrElse(0) + evs.size,
              total_value = prev.map(_.total_value).getOrElse(0.0) + evs.map(_.value).sum,
              first_ts = prev.map(_.first_ts).getOrElse(sorted.head.ts),
              last_ts = sorted.last.ts)
            state.update(merged)
            state.setTimeoutDuration("30 seconds")
            Iterator.empty
          } else Iterator.empty
        })
  }
}

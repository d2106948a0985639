package graft.crawl

import graft.model.CrawlConfig
import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Structured-Streaming twin of the batch crawl loop (SURVEY.md §3.9 T1
  * optional path): `foreachBatch` + `Trigger.AvailableNow`, one crawl
  * round per micro-batch.
  *
  * The driver writes one "tick" file per requested round; the file
  * source (`maxFilesPerTrigger = 1`) delivers them as micro-batches and
  * each batch advances the SAME snapshot store by `CrawlLoop.run(…, 1)`.
  * Byte-identical outputs are NOT a coincidence of this wrapper — they
  * are the engine's resume contract (CrawlSpec RESUME: stop+resume ≡
  * straight-through, byte-exact), which makes "round = micro-batch"
  * semantically free. The streaming machinery adds its own value on top:
  * source progress is checkpointed (`checkpointLocation`), so a killed
  * stream restarted over the same tick directory re-runs ONLY the
  * unprocessed rounds — exactly-once round execution without any custom
  * bookkeeping, double-protected by the store's atomic snapshot commit.
  *
  * `init()` (snapshot 0) stays a batch call, as in the batch driver.
  */
object StreamingCrawl {

  /** Run `rounds` micro-batch rounds; returns rounds executed. */
  def run(
      store: SnapshotStore,
      cfg: CrawlConfig,
      corpus: DataFrame,
      hostDeaths: DataFrame,
      rounds: Int,
      /** stream checkpoint + tick dirs; a temp dir per run by default —
        * pass a stable path to make the STREAM itself resumable. */
      workDir: Option[String] = None)(implicit spark: SparkSession): Int = {
    import spark.implicits._
    val base = Paths.get(workDir.getOrElse(
      Files.createTempDirectory("crawl-stream").toString))
    Files.createDirectories(base)
    val tickDir = base.resolve("ticks")
    Files.createDirectories(tickDir)
    // one single-row parquet file per round tick — written sequentially
    // so file-source ordering is stable (content is informational only:
    // every batch just runs `count(batch)` rounds)
    (1 to rounds).foreach { i =>
      Seq(i).toDF("tick").coalesce(1).write.mode("append")
        .parquet(tickDir.resolve(f"tick-$i%04d").toString)
    }
    var executed = 0
    val q = spark.readStream
      .schema("tick INT")
      .option("maxFilesPerTrigger", 1)
      .parquet(tickDir.toString + "/*")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val n = batch.count().toInt // ticks delivered in this micro-batch
        if (n > 0) {
          val loop = new CrawlLoop(store, cfg)
          executed += loop.run(corpus, hostDeaths, n)
        }
        ()
      }
      .option("checkpointLocation", base.resolve("checkpoint").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    executed
  }
}

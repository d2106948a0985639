package graft.pipeline

import graft.store.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** Structured-Streaming twin of the committed span census
  * ([[SpanIndex]]) — duplicate-SPAN removal for an arriving corpus, the
  * [[StreamingDedup]] shape applied to exact-substring dedup: each
  * micro-batch is flagged against everything already ingested (plus
  * itself) WITHOUT recounting corpus windows, then its partial counts
  * join the census in the same atomic commit.
  *
  * Tables advanced per batch (ONE commit):
  *   - `span_docs`     — the batch's (id, text) rows;
  *   - `dd_spans`      — [[SpanIndex]]'s partial-count census delta;
  *   - `span_verdicts` — the batch's span-removal verdicts
  *     (id, n_tokens, n_removed, kept_text, ingest_batch).
  *
  * Verdicts are AS-OF-INGEST-TIME — the standard online semantics: a
  * span first duplicated by a LATER batch updates that later batch's
  * verdict, not this one's (the later arrival sees the span's committed
  * count and flags its own copy). The census itself stays exact: after
  * any drain it equals a full rebuild (partial counts merge by sum), so
  * an offline [[Dedup.dupSpanRemoval]] pass can always recompute any
  * doc's global verdict — StreamingSpec pins both properties.
  *
  * Exactly-once across crashes: the [[StreamingDedup]] batch-id
  * high-water manifest tag recipe, under this stream's own tag.
  */
object StreamingSpanDedup {

  val DocsTable = "span_docs"
  val VerdictsTable = "span_verdicts"
  val IngestBatchTag = "span_ingest_batch"

  private def ckptKeyOf(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
    d.take(4).map(b => f"$b%02x").mkString
  }

  /** Drain all parquet files under `docsDir` as micro-batches into
    * `store`; returns the number of non-empty batches processed.
    */
  def run(
      store: SnapshotStore, docsDir: String, schema: StructType,
      idCol: String, textCol: String,
      k: Int = 8, family: HashFamily = HashFamily.XxHash64,
      workDir: Option[String] = None,
      /** census-maintenance cadence ([[StreamingDedup]]'s pattern):
        * every K processed batches, rewrite the accreted partial counts
        * into the hash-prefix layout so probe reads stay delta-sized.
        * Int.MaxValue disables. */
      compactEveryBatches: Int = 16)(implicit spark: SparkSession): Int = {
    val base = Paths.get(workDir.getOrElse(
      Files.createTempDirectory("span-stream").toString))
    Files.createDirectories(base)
    var processed = 0
    val ckptDir = base.resolve("checkpoint").toString
    val ckptKey = ckptKeyOf(ckptDir)
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val replayed = store.latestTag(IngestBatchTag).exists { v =>
          val sep = v.indexOf(':')
          sep > 0 && v.substring(0, sep) == ckptKey &&
            v.substring(sep + 1).toLong >= batchId
        }
        val batch = batch0.select(col(idCol), col(textCol)).localCheckpoint()
        if (!replayed && batch.count() > 0) {
          val snap = store.latestSnapshot.map(_ + 1).getOrElse(0)
          // first-batch detection must check for the CENSUS table, not
          // just any snapshot: on a store shared with another pipeline
          // the first span batch would otherwise take the committed path
          // and read a table that does not exist (advice fix, round 7)
          val hasPrev = store.latestSnapshot.exists(s =>
            store.tablesAt(s).contains(SpanIndex.SpansTable))
          // flag BEFORE append (SpanIndex's ingest-order contract); the
          // very first batch has no census yet — its verdicts are the
          // inline operator over the batch alone, which is exactly what
          // an empty census reduces to
          val verdicts =
            (if (hasPrev)
              SpanIndex.dupSpanRemovalFor(store, batch, idCol, textCol, k, family)
            else Dedup.dupSpanRemoval(batch, idCol, textCol, k, family))
              .withColumn("ingest_batch", lit(batchId))
              .localCheckpoint()
          store.commit(snap,
            overwrite = Map.empty,
            append = Map(
              DocsTable -> batch,
              SpanIndex.SpansTable ->
                SpanIndex.censusRows(batch, idCol, textCol, k, family),
              VerdictsTable -> verdicts),
            tags = Map(IngestBatchTag -> s"$ckptKey:$batchId"))
          processed += 1
          if (processed % compactEveryBatches == 0)
            SpanIndex.compactPrefix(store, snap + 1)
        }
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    processed
  }
}

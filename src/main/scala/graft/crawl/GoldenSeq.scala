package graft.crawl

import graft.functions.SketchExpressions
import graft.model.CrawlLogEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-range-partition facts of one round's schedule: row counts (the
  * sequence offsets), their total, and a Bloom over the scheduled URLs
  * (the corpus-fetch prefilter).
  */
final case class SchedStats(counts: Map[Int, Long], total: Long, urlBloom: BloomFilter)

/** Scale-safe golden crawl-log sequencing (SURVEY.md §6.1 O1 / §3.1 K5).
  *
  * The normative crawl order is a GLOBAL total order (priority DESC,
  * enqueue_seq ASC, url ASC). `row_number() OVER (ORDER BY ...)` computes
  * it with an `Exchange SinglePartition` — one task sorts the whole
  * round's schedule, the one 100×-scale-killer in the flagship path.
  *
  * Instead the schedule is `repartitionByRange` on the same order (every
  * partition holds a contiguous range, partitions are mutually ordered)
  * and the dense sequence is assigned as
  *
  *   seq(row) = seqBase + Σ counts(partitions before mine) + local rank
  *
  * which equals the global row_number by construction, with no
  * single-task stage. Partition-count independent: different range
  * boundaries only move rows between adjacent partitions; cumulative
  * offsets + local ranks reproduce the identical global sequence
  * (asserted by the partitioning-independence test and the frozen golden).
  */
object GoldenSeq {

  /** Lay the schedule out as ordered ranges of the normative crawl order
    * and STORE each row's range-partition id in the cache. The id column
    * must be baked into the cached data (evaluated once, at cache
    * materialization): task-level ids (`TaskContext`/`spark_partition_id`
    * evaluated above the cache) are renumbered when the plan runs inside
    * a union — e.g. the combined append write — and would disagree with
    * the offsets `stats` computed.
    */
  def layout(schedule: DataFrame, numPartitions: Int): DataFrame =
    schedule
      .repartitionByRange(numPartitions, graft.frontier.Politeness.Order: _*)
      .sortWithinPartitions(graft.frontier.Politeness.Order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)

  /** ONE job over the cached range-partitioned schedule computing all
    * per-round driver facts that previously cost three: per-partition
    * counts (offsets), the total (`scheduledCount`, seqBase advance), and
    * the URL Bloom that prunes the fat corpus side of the fetch join
    * map-side. `bloomItems` is a size HINT (the frontier size bounds it);
    * a low hint only raises the prefilter's FPP — the fetch equi-join
    * discards false positives, so exactness is hint-independent.
    */
  def stats(scheduled: DataFrame, bloomItems: Long, bloomFpp: Double = 0.01): SchedStats = {
    val rows = scheduled
      .groupBy(col("_pid"))
      .agg(count(lit(1L)).as("cnt"),
        SketchExpressions.bloom_agg(col("url"), bloomItems, bloomFpp).as("bf"))
      .collect()
    val counts = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val blooms = rows.map(r => SketchExpressions.readSketch(r.getAs[Array[Byte]](2)))
    val bloom =
      if (blooms.isEmpty) BloomFilter.create(1) // empty schedule: matches nothing
      else blooms.reduce { (a, b) => a.mergeInPlace(b); a }
    SchedStats(counts, counts.valuesIterator.sum, bloom)
  }

  /** Dense sequence assignment over the SAME cache `stats` ran on: a
    * zero-shuffle per-partition scan — the stored `_pid` and in-partition
    * order are pinned by the cache, offsets close the gaps between
    * ranges. (A `Window PARTITION BY _pid` would re-shuffle every row by
    * pid for the same result.) Every row in one cache partition carries
    * the same `_pid`, so the head row keys the offset lookup.
    */
  def assign(scheduled: DataFrame, st: SchedStats, round: Int, seqBase: Long)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val offsets: Map[Int, Long] = {
      var acc = seqBase
      st.counts.toSeq.sortBy(_._1).map { case (pid, n) =>
        val entry = pid -> acc; acc += n; entry
      }.toMap
    }
    scheduled.select(col("url"), col("host"), col("priority"), col("_pid"))
      .as[(String, String, Int, Int)]
      .mapPartitions { it =>
        // offsets is a ≤ #partitions-sized map, serialized with the task
        if (!it.hasNext) Iterator.empty
        else {
          val buf = it.buffered
          var seq = offsets.getOrElse(buf.head._4, 0L)
          buf.map { case (u, h, p, _) => seq += 1; CrawlLogEntry(seq, round, u, h, p) }
        }
      }
      .toDF()
  }
}

package graft.crawl

import graft.dedup.FastBloom
import graft.model.CrawlLogEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-range-partition facts of one round's schedule: row counts (the
  * sequence offsets), their total, and a Bloom over the scheduled URLs
  * (the corpus-fetch prefilter).
  */
final case class SchedStats(counts: Map[Int, Long], total: Long, urlBloom: FastBloom)

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

  /** Per-round Bloom size cap: the schedule is politeness-bounded, and
    * the filter is a pure PREFILTER (the fetch equi-join discards false
    * positives), so capping only raises FPP — never wrongness. 2^22 items
    * at 1% FPP ≈ 40M bits ≈ 5 MB: the fixed per-partial-buffer memory
    * bound on executors, and the size of the ONE filter the driver
    * receives, regardless of frontier scale.
    */
  val MaxBloomItems: Long = 1L << 22

  /** seqOp accumulator: per-range counts + the partial URL Bloom. */
  private final class StatsAcc(val counts: Array[Long], val bloom: FastBloom)
    extends Serializable

  /** ONE RDD job over the cached range-partitioned schedule computing all
    * per-round driver facts that previously cost three: per-partition
    * counts (offsets), the total (`scheduledCount`, seqBase advance), and
    * the URL Bloom that prunes the fat corpus side of the fetch join
    * map-side. Partials merge EXECUTOR-SIDE via `treeAggregate(depth=2)`:
    * exactly ONE ≤5 MB filter reaches the driver, and the merge is
    * FastBloom's bulk word-OR — per-range full-size partials collected to
    * the driver (the original shape) are multi-GB at a multi-million-row
    * schedule with hundreds of partitions, and the native sketch
    * aggregate's single-task stream-deserializing merge profiled at
    * multi-second serial cost per round.
    *
    * `bloomItems` is a size HINT (previous round's schedule size, capped
    * at [[MaxBloomItems]]); a low hint only raises the prefilter's FPP —
    * the fetch equi-join discards false positives, so exactness is
    * hint-independent.
    */
  def stats(scheduled: DataFrame, bloomItems: Long, bloomFpp: Double = 0.01): SchedStats = {
    val nParts = scheduled.rdd.getNumPartitions
    val items = math.min(math.max(1024L, bloomItems), MaxBloomItems)
    val rows = scheduled.select(col("_pid"), col("url")).queryExecution.toRdd
    val agg = rows.treeAggregate(null.asInstanceOf[StatsAcc])(
      (acc0, r) => {
        val acc = if (acc0 == null)
          new StatsAcc(new Array[Long](nParts), FastBloom.create(items, bloomFpp))
        else acc0
        acc.counts(r.getInt(0)) += 1
        if (!r.isNullAt(1)) acc.bloom.put(r.getUTF8String(1).getBytes)
        acc
      },
      (a, b) =>
        if (a == null) b
        else if (b == null) a
        else {
          var i = 0
          while (i < a.counts.length) { a.counts(i) += b.counts(i); i += 1 }
          a.bloom.orInPlace(b.bloom)
          a
        },
      depth = 2)
    val counts =
      if (agg == null) Map.empty[Int, Long]
      else agg.counts.zipWithIndex.collect { case (n, i) if n > 0 => i -> n }.toMap
    val bloom =
      if (agg == null) FastBloom.create(1, bloomFpp) // empty: matches nothing
      else agg.bloom
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

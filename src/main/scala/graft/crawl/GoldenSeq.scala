package graft.crawl

import graft.functions.SketchExpressions
import graft.model.CrawlLogEntry
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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

  /** Per-round Bloom size cap: the schedule is politeness-bounded, and
    * the filter is a pure PREFILTER (the fetch equi-join discards false
    * positives), so capping only raises FPP — never wrongness. 2^22 items
    * at 1% FPP ≈ 40M bits ≈ 5 MB: the fixed per-partial-buffer memory
    * bound on executors, and the size of the ONE filter the driver
    * receives, regardless of frontier scale.
    */
  val MaxBloomItems: Long = 1L << 22

  private val statsSeq = new java.util.concurrent.atomic.AtomicLong()

  /** ONE job over the cached range-partitioned schedule computing all
    * per-round driver facts that previously cost three: per-partition
    * counts (offsets, ridden as OBSERVED metrics — a handful of longs per
    * task), the total (`scheduledCount`, seqBase advance), and the URL
    * Bloom that prunes the fat corpus side of the fetch join map-side.
    * The Bloom is a GLOBAL two-stage aggregate: partial filters merge
    * executor-side through the shuffle and exactly ONE ≤5 MB filter
    * reaches the driver — per-range full-size partials collected to the
    * driver (the previous shape) are multi-GB at a multi-million-row
    * schedule with hundreds of partitions.
    *
    * `bloomItems` is a size HINT (previous round's schedule size, capped
    * at [[MaxBloomItems]]); a low hint only raises the prefilter's FPP —
    * the fetch equi-join discards false positives, so exactness is
    * hint-independent.
    */
  def stats(scheduled: DataFrame, bloomItems: Long, bloomFpp: Double = 0.01): SchedStats = {
    val nParts = scheduled.rdd.getNumPartitions
    val items = math.min(math.max(1024L, bloomItems), MaxBloomItems)
    val obs = Observation(s"sched-stats-${statsSeq.incrementAndGet()}")
    val cntCols = (0 until nParts).map(i =>
      sum(when(col("_pid") === i, 1L).otherwise(0L)).as(s"c$i"))
    val bytes = scheduled
      .observe(obs, cntCols.head, cntCols.tail: _*)
      .select(SketchExpressions.bloom_agg(col("url"), items, bloomFpp).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val metrics = obs.get
    val counts = (0 until nParts).flatMap { i =>
      Option(metrics(s"c$i")).map(_.asInstanceOf[Long]).filter(_ > 0).map(i -> _)
    }.toMap
    val bloom =
      if (bytes == null) BloomFilter.create(1) // empty schedule: matches nothing
      else SketchExpressions.readSketch(bytes)
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

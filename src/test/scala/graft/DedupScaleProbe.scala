package graft

import org.apache.spark.sql.functions._

/** Dedup scaling probe: `Test/runMain graft.DedupScaleProbe <nHosts> <reps>`
  * with `SPARK_GRAFT_CPUS` setting the thread count — MinHash-LSH
  * near-dup throughput over the engine's own synthetic corpus (the same
  * fixture machinery the crawl bench uses), at a scale where the work
  * dwarfs fixed per-job cost. The sf0.1 headline queries are 1–3 s jobs
  * that sit at their latency FLOOR at 32 threads (measured flat 8→32 —
  * BENCH/BASELINE.md round-6), so query-side scaling evidence needs a
  * work-rich input; this is it. The input is persisted and materialized
  * OUTSIDE the timed region so the number is the dedup pipeline, not
  * corpus generation. Prints docs, min wall, docs/sec per rep set.
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val nHosts = args(0).toLong
    val reps = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.fixtures.SyntheticCorpus.docsDF(spark, nHosts)
      .select(col("doc_id"),
        concat_ws("\n", transform(
          filter(col("spans"), s => s.getField("kind") === "text"),
          s => s.getField("text"))).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()

    def procCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime / 1e9
    def run(): Long =
      graft.pipeline.Dedup.minhashNearDups(docs, "doc_id", "text", tau = 0.5).count()
    // optional 3rd arg "spanscale": duplicate-span removal (dd12's
    // production xx64 parameterization) on the same work-rich corpus —
    // the two-parallelism scaling evidence for the round-6 span family
    if (args.length > 2 && args(2) == "spanscale") {
      // aggregate over the COMPUTED columns — a bare count() lets
      // Catalyst eliminate the unique-key left join and the whole
      // coverage pipeline with it (measured 0.26 s for 277k docs)
      def runSpan(): Long =
        graft.pipeline.Dedup.dupSpanRemoval(docs, "doc_id", "text")
          .agg(sum(col("n_removed")) + sum(length(col("kept_text"))))
          .collect()(0).getLong(0)
      runSpan() // warm
      val times = (1 to reps).map { _ =>
        val c0 = procCpuSec(); val t0 = System.nanoTime()
        runSpan()
        ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
      }
      val best = times.minBy(_._1)
      println(f"DSPAN cpus=$cpus%s docs=$nDocs%d minWall=${best._1}%.2f " +
        f"cpuSec=${best._2}%.1f docsPerSec=${nDocs / best._1}%.0f " +
        f"walls=[${times.map(t => f"${t._1}%.2f").mkString(", ")}]")
      return
    }
    // optional 3rd arg "verify_ab": same-JVM alternating A/B of the fused
    // exact-Jaccard verify vs the set-algebra composition (identical
    // signatures/bands/candidates stages), min per side — the work-rich
    // twin of DD03Probe's floor-bound sf0.1 stage walk
    if (args.length > 2 && args(2) == "verify_ab") {
      import graft.pipeline.Dedup
      def pipeline(composed: Boolean): Long = {
        val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
        val cands = Dedup.lshCandidatePairs(sigs, "doc_id", 16, 4)
        val ej = if (composed) Dedup.exactJaccardComposed(docs, cands, "doc_id", "text")
          else Dedup.exactJaccard(docs, cands, "doc_id", "text")
        ej.filter(col("jaccard") >= 0.5).count()
      }
      pipeline(false); pipeline(true) // warm both sides
      def timed(composed: Boolean): Double = {
        val t0 = System.nanoTime(); pipeline(composed); (System.nanoTime() - t0) / 1e9
      }
      val walls = (1 to reps).flatMap(_ => Seq(false -> timed(false), true -> timed(true)))
      def side(c: Boolean) = walls.collect { case (`c`, w) => w }
      println(f"DSCALE_AB cpus=$cpus%s docs=$nDocs%d " +
        f"fusedMin=${side(false).min}%.2f composedMin=${side(true).min}%.2f " +
        f"fused=[${side(false).map(w => f"$w%.2f").mkString(", ")}] " +
        f"composed=[${side(true).map(w => f"$w%.2f").mkString(", ")}]")
      return
    }
    // optional 3rd arg "gram_ab": round-7 work-rich A/B of the fused
    // per-doc gram-count ta09 shape (one exchange) vs the tagged
    // per-occurrence composition (two exchanges) — the structural
    // evidence the floor-bound sf0.1 timings can't show
    if (args.length > 2 && args(2) == "gram_ab") {
      import graft.pipeline.TextAnalysis
      def pipeline(composed: Boolean): Long =
        (if (composed) TextAnalysis.ngramCountsComposed(docs, "doc_id", "text", 3, 3)
         else TextAnalysis.ngramCounts(docs, "doc_id", "text", 3, 3)).count()
      pipeline(false); pipeline(true) // warm both sides
      def timed(composed: Boolean): (Double, Double) = {
        val c0 = procCpuSec(); val t0 = System.nanoTime()
        pipeline(composed)
        ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
      }
      val walls = (1 to reps).flatMap(_ => Seq(false -> timed(false), true -> timed(true)))
      def side(c: Boolean) = walls.collect { case (`c`, w) => w }
      println(f"DGRAM_AB cpus=$cpus%s docs=$nDocs%d " +
        f"fusedMin=${side(false).map(_._1).min}%.2f@${side(false).minBy(_._1)._2}%.0fcpu " +
        f"composedMin=${side(true).map(_._1).min}%.2f@${side(true).minBy(_._1)._2}%.0fcpu " +
        f"fused=[${side(false).map(w => f"${w._1}%.2f").mkString(", ")}] " +
        f"composed=[${side(true).map(w => f"${w._1}%.2f").mkString(", ")}]")
      return
    }
    // optional 3rd arg "overlap_ab": round-7 work-rich A/B of the
    // grouped pipe10 shape (collect_set by shingle, one corpus exchange)
    // vs the distinct + self-join composition (three scan subtrees)
    if (args.length > 2 && args(2) == "overlap_ab") {
      import graft.pipeline.Curation
      val srcDocs = docs.withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("doc_id")), lit(20)).cast("string")))
      def pipeline(composed: Boolean): Long =
        (if (composed) Curation.sourceOverlapMatrixComposed(srcDocs, "source", "text")
         else Curation.sourceOverlapMatrix(srcDocs, "source", "text")).count()
      pipeline(false); pipeline(true) // warm both sides
      def timed(composed: Boolean): (Double, Double) = {
        val c0 = procCpuSec(); val t0 = System.nanoTime()
        pipeline(composed)
        ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
      }
      val walls = (1 to reps).flatMap(_ => Seq(false -> timed(false), true -> timed(true)))
      def side(c: Boolean) = walls.collect { case (`c`, w) => w }
      println(f"DOVERLAP_AB cpus=$cpus%s docs=$nDocs%d " +
        f"groupedMin=${side(false).map(_._1).min}%.2f@${side(false).minBy(_._1)._2}%.0fcpu " +
        f"composedMin=${side(true).map(_._1).min}%.2f@${side(true).minBy(_._1)._2}%.0fcpu " +
        f"grouped=[${side(false).map(w => f"${w._1}%.2f").mkString(", ")}] " +
        f"composed=[${side(true).map(w => f"${w._1}%.2f").mkString(", ")}]")
      return
    }
    run() // warm
    val times = (1 to reps).map { _ =>
      val c0 = procCpuSec(); val t0 = System.nanoTime()
      run()
      ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
    }
    val best = times.minBy(_._1)
    println(f"DSCALE cpus=$cpus%s hosts=$nHosts%d docs=$nDocs%d " +
      f"minWall=${best._1}%.2f cpuAtMin=${best._2}%.1f docsPerSec=${nDocs / best._1}%.0f " +
      f"all=[${times.map(t => f"${t._1}%.2f").mkString(", ")}]")
  }
}

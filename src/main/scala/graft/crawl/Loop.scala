package graft.crawl

import graft.dedup.SeenSet
import graft.model._
import graft.store.SnapshotStore
import graft.url.{EnqueueSeq, Urls}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative batch crawl driver (SURVEY.md §3.9 T1): each round is one
  * Catalyst program ending in an atomic snapshot commit; the next round
  * re-reads the committed state (Parquet-backed ⇒ short plans, no
  * iterative lineage blow-up), so a run is resumable from ANY snapshot —
  * straight-through and stop+resume produce byte-identical tables.
  */
final class CrawlLoop(
    val store: SnapshotStore,
    cfg: CrawlConfig)(implicit spark: SparkSession) {

  import spark.implicits._

  private val Overwrite = Seq("frontier", "domains")
  private val Appends = Seq("seen", "pages", "links", "emails", "btc_addresses",
    "ssh_fps", "open_ports", "crawl_log", "metrics")

  /** Snapshot 0: seed frontier + seed-seen (Scrapy marks seen at ENQUEUE
    * time — SURVEY.md §6.5) + empty entity tables.
    */
  def init(seedUrls: Seq[String]): Unit = {
    val canon = seedUrls.map(Urls.canonicalize).distinct
    val entries = canon.map { u =>
      FrontierEntry(u, Urls.hostOf(u), Priorities.NewOnion, Priorities.TierNew,
        0, EnqueueSeq.forSeed(u), "", 1, 0)
    }
    val seen = canon.map(u => Seen(Urls.fingerprint(u), u, 1))
    val emptyDomains = spark.emptyDataset[DomainRow].toDF()
    store.commit(0,
      overwrite = Map(
        "frontier" -> entries.toDS().toDF(),
        "domains" -> emptyDomains),
      append = Map(
        "seen" -> seen.toDS().toDF(),
        "pages" -> spark.emptyDataset[PageRow].toDF(),
        "links" -> spark.emptyDataset[LinkRow].toDF(),
        "emails" -> spark.emptyDataset[FactRow].toDF(),
        "btc_addresses" -> spark.emptyDataset[FactRow].toDF(),
        "ssh_fps" -> spark.emptyDataset[FactRow].toDF(),
        "open_ports" -> spark.emptyDataset[FactRow].toDF(),
        "crawl_log" -> spark.emptyDataset[CrawlLogEntry].toDF(),
        "metrics" -> spark.emptyDataset[MetricsRow].toDF()))
  }

  /** Run `rounds` more rounds from the latest committed snapshot. */
  def run(
      corpus: DataFrame,
      robots: Dataset[RobotsRule],
      hostDeaths: DataFrame,
      rounds: Int): Int = {
    val startSnap = store.latestSnapshot.getOrElse(
      throw new IllegalStateException("call init() first"))
    val seenSet = new SeenSet(cfg, store.rootDir, store.latestSnapshot)
    // corpus is immutable: derive the live-host set once, reuse all rounds
    val hostUdf = udf((u: String) => Urls.hostOf(u))
    val corpusHosts = corpus.select(hostUdf(col("doc_id")).as("host"))
      .distinct().persist()
    // no checkpointed filter (fresh run or lost sidecar): rebuild from the
    // authoritative seen table — an empty Bloom over non-empty seen would
    // wrongly bypass the exact anti-join for every rediscovered URL
    if (!seenSet.loadedFromCheckpoint) seenSet.rebuildFrom(store.read("seen"))

    var r = startSnap
    var executed = 0
    // golden-seq base: counted once on resume, then tracked incrementally
    // (a full crawl_log count per round would rescan the whole log)
    var seqBase = store.read("crawl_log").count()
    while (executed < rounds) {
      r += 1
      val in = RoundInputs(
        frontier = store.read("frontier"),
        seen = store.read("seen"),
        domains = store.read("domains"),
        pages = store.read("pages"),
        corpus = corpus,
        corpusHosts = corpusHosts,
        robots = robots,
        hostDeaths = hostDeaths)
      // count doubles as the termination check AND the round's Bloom size
      // hint (the schedule is bounded by the frontier)
      val frontierRows = in.frontier.count()
      if (frontierRows == 0) { corpusHosts.unpersist(); return executed }
      val out = Round.run(in, cfg, r, seqBase, seenSet, schedHint = frontierRows)
      // sidecar BEFORE the manifest flip: bloom-ahead-of-seen is FP-safe,
      // bloom-behind is not (see SeenSet scaladoc / crash-consistency)
      seenSet.update(out.seenDelta, r)
      store.commit(r,
        overwrite = Map(
          "frontier" -> out.frontierNext,
          "domains" -> out.domains),
        append = Map(
          "seen" -> out.seenDelta,
          "pages" -> out.pagesDelta,
          "links" -> out.linksDelta,
          "emails" -> out.emailsDelta,
          "btc_addresses" -> out.btcDelta,
          "ssh_fps" -> out.sshFpsDelta,
          "open_ports" -> out.portsDelta,
          "crawl_log" -> out.crawlLogDelta,
          "metrics" -> out.metricsDelta))
      seqBase += out.scheduledCount
      if (r % cfg.compactEveryRounds == 0)
        store.compact(r, "seen", Seq("fingerprint"), buckets = cfg.saltBuckets)
      out.cached.foreach(_.unpersist())
      executed += 1
    }
    corpusHosts.unpersist()
    executed
  }
}

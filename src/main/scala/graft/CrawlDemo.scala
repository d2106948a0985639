package graft

import graft.crawl.CrawlLoop
import graft.fixtures.SyntheticCorpus
import graft.model.CrawlConfig
import graft.store.SnapshotStore
import org.apache.spark.sql.SparkSession

/** CLI entry point: run the crawl loop end-to-end on the deterministic
  * synthetic corpus and print a round-by-round summary.
  *
  *   sbt "runMain graft.CrawlDemo <stateDir> <nHosts> <rounds>"
  *   spark-submit --class graft.CrawlDemo <jar> <stateDir> <nHosts> <rounds>
  *
  * Re-running with the same <stateDir> RESUMES from the last committed
  * snapshot (SURVEY.md §6 / BASELINE.json "resumable from checkpoint").
  */
object CrawlDemo {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: CrawlDemo <stateDir> <nHosts> <rounds>")
      sys.exit(2)
    }
    val Array(stateDir, nHostsS, roundsS) = args.take(3)
    val nHosts = nHostsS.toInt
    val rounds = roundsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    implicit val spark: SparkSession = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-crawl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = CrawlConfig()
    val store = new SnapshotStore(stateDir, spark)
    val loop = new CrawlLoop(store, cfg)
    val resumedFrom = store.latestSnapshot
    if (resumedFrom.isEmpty)
      loop.init(SyntheticCorpus.seedsLocal(nHosts, math.max(3, nHosts / 4)),
        SyntheticCorpus.robotsLocal(nHosts).toDS())
    else println(s"[crawl] resuming from snapshot ${resumedFrom.get}")

    // robots_rules are read from the committed snapshot — a resumed run
    // restores the politeness gate without re-supplying it
    val executed = loop.run(
      SyntheticCorpus.docsLocal(nHosts).toDS().toDF(),
      SyntheticCorpus.hostDeathsLocal(nHosts).toDF("host", "dead_from_round"),
      rounds)

    println(s"[crawl] executed $executed round(s); latest snapshot = ${store.latestSnapshot.get}")
    println("[crawl] crawl_log (first 15 by seq):")
    store.read("crawl_log").orderBy("seq").show(15, truncate = false)
    println("[crawl] per-round metrics (summed over partitions):")
    store.read("metrics").groupBy("round")
      .sum("urls_in", "denied", "deduped", "scheduled", "fetched", "new_onions")
      .orderBy("round").show(50)
    println("[crawl] domains summary:")
    store.read("domains")
      .groupBy("is_up").count().show()
    spark.stop()
  }
}

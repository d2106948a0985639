package graft.crawl

import graft.SparkTestSession
import graft.queries.CrawlQueries
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Independent cross-implementation oracle for the crawl engine
  * (SURVEY.md §6): `tools/crawl_twin.py` re-implements the determinism
  * contract — canonicalize → sha1 fingerprint → tier priorities → total
  * order → politeness budget → corpus join → span-order link extraction
  * + enqueue_seq arithmetic → seen set → domain lifecycle merge — in
  * pure Python, sharing zero code with the engine. This spec dumps the
  * engine's crawl01_log / crawl02_domains / crawl03_seen tables and asks
  * the twin to byte-diff them against its own replay. Unlike the frozen
  * goldens (which the engine generated, so they prove stability, not
  * initial correctness), a match here is genuine two-implementation
  * agreement on every sequence number, domain lifecycle field and seen
  * fingerprint.
  */
class CrawlTwinSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark

  private def fmt(v: Any): String = v match {
    case null       => ""
    case b: Boolean => if (b) "true" else "false"
    case x          => x.toString
  }

  private def dumpAndDiff(st: graft.store.SnapshotStore, nHosts: Int, rounds: Int): Unit = {
    val dir = Files.createTempDirectory("graft-twin").toString

    def dump(name: String, lines: Seq[String]): Unit =
      Files.writeString(Paths.get(dir, name), lines.mkString("\n") + "\n")

    dump("crawl01_log.tsv",
      st.read("crawl_log").orderBy("seq")
        .select("seq", "round", "url", "host", "priority")
        .collect().toSeq.map(r => (0 until 5).map(i => fmt(r.get(i))).mkString("\t")))

    dump("crawl02_domains.tsv",
      st.read("domains")
        .select("host", "is_up", "dead_in_a_row", "first_seen_round",
          "last_visited_round", "last_alive_round", "is_fake", "genuine_host",
          "pages_crawled", "server", "powered_by")
        .orderBy("host")
        .collect().toSeq.map(r => (0 until 11).map(i => fmt(r.get(i))).mkString("\t")))

    dump("crawl03_seen.tsv",
      st.read("seen").select("fingerprint", "url").orderBy("fingerprint")
        .collect().toSeq.map(r => s"${r.getString(0)}\t${r.getString(1)}"))

    // the per-round append sinks the downstream crawl queries read
    // (crawl04 links, crawl08 pages transitions, crawl11/12 facts,
    // crawl13 media span order) — twinned as whole tables, so those
    // queries' INPUTS are cross-implementation-pinned, not just the
    // frontier state above
    def dumpTable(name: String, cols: Seq[String], sortCols: Seq[String]): Unit =
      dump(s"$name.tsv",
        st.read(name).orderBy(sortCols.head, sortCols.tail: _*)
          .select(cols.head, cols.tail: _*)
          .collect().toSeq.map(r => (0 until cols.size).map(i => fmt(r.get(i))).mkString("\t")))

    dumpTable("pages",
      Seq("url", "host", "status", "title", "is_frontpage", "visited_round",
        "content_sha1"),
      Seq("url", "visited_round", "status"))
    dumpTable("links",
      Seq("src_url", "dst_url", "src_host", "dst_host", "round"),
      Seq("src_url", "dst_url", "src_host", "dst_host", "round"))
    dumpTable("media_refs",
      Seq("url", "host", "media_ref", "pos", "round"),
      Seq("url", "host", "media_ref", "pos", "round"))
    Seq("emails", "btc_addresses", "ssh_fps", "open_ports").foreach(t =>
      dumpTable(t, Seq("host", "value", "round"), Seq("host", "value", "round")))
    dumpTable("pages_fts",
      Seq("term", "url", "host", "in_title", "round"),
      Seq("term", "url", "host", "in_title", "round"))

    // per-round metric SUMS (= crawl09_metrics' exact output): the
    // engine's table additionally carries per-partition lineage, which
    // is execution-layout detail the twin has no business replaying —
    // the deterministic contract is the per-round totals
    dump("metrics.tsv", {
      import org.apache.spark.sql.functions.sum
      st.read("metrics").groupBy("round")
        .agg(sum("urls_in").as("urls_in"), sum("denied").as("denied"),
          sum("deduped").as("deduped"), sum("scheduled").as("scheduled"),
          sum("fetched").as("fetched"), sum("new_onions").as("new_onions"))
        .orderBy("round")
        .collect().toSeq.map(r => (0 until 7).map(i => fmt(r.get(i))).mkString("\t"))
    })

    // the analytic crawl queries themselves (crawl04..crawl13) — dumped
    // from the EXACT per-store query programs the driver surface runs
    // (CrawlQueries.over), so a twin match pins each query end to end:
    // inputs (the tables above) AND the aggregation/ranking semantics.
    // crawl09 is byte-identical to metrics.tsv (same program); crawl14
    // (PageRank) stays out — FP iteration order is execution detail,
    // RankSpec pins it against a dense local reference.
    val queries = CrawlQueries.over(st, spark)
    def dumpQuery(file: String, name: String): Unit =
      dump(file, queries(name)().collect().toSeq.map(r =>
        (0 until r.size).map(i => fmt(r.get(i))).mkString("\t")))
    dumpQuery("q_crawl04_link_degrees.tsv", "crawl04_link_degrees")
    dumpQuery("q_crawl05_search.tsv", "crawl05_search")
    dumpQuery("q_crawl06_top_emails.tsv", "crawl06_top_emails")
    dumpQuery("q_crawl07_clones.tsv", "crawl07_clones")
    dumpQuery("q_crawl08_transitions.tsv", "crawl08_transitions")
    dumpQuery("q_crawl10_sql_api.tsv", "crawl10_sql_api")
    dumpQuery("q_crawl11_ssh_lookup.tsv", "crawl11_ssh_lookup")
    dumpQuery("q_crawl12_ports.tsv", "crawl12_ports")
    dumpQuery("q_crawl13_media.tsv", "crawl13_media")

    val cmd = Seq("python3", "tools/crawl_twin.py",
      "--nhosts", nHosts.toString, "--rounds", rounds.toString,
      "--engine-dir", dir)
    val out = new StringBuilder
    val exit = cmd.!(ProcessLogger(l => out.append(l).append('\n')))
    info(out.toString)
    assert(exit == 0, s"crawl twin diverged:\n$out")
  }

  test("crawl01/02/03 match the independent pure-Python replay byte-for-byte") {
    val python = Seq("bash", "-lc", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not available in this environment")
    dumpAndDiff(CrawlQueries.store(spark), CrawlQueries.NHosts, CrawlQueries.Rounds)
  }

  /** Different host count + an ODD round count: retry exhaustion, recrawl
    * cadence and clone-group composition all shift, so a match here rules
    * out the twin being tuned to the one fixture shape — and 5 rounds ends
    * OFF the compactEveryRounds=2 cadence, so the FTS diff covers the
    * compacted base PLUS a raw post-compaction delta (the steady-state
    * mixed layout), not just the fully-collapsed state.
    */
  private def runAndDiff(nHosts: Int, rounds: Int): Unit = {
    import spark.implicits._
    import graft.fixtures.SyntheticCorpus
    val dir = Files.createTempDirectory("graft-twin-crawl").toString
    val st = new graft.store.SnapshotStore(dir, spark)
    val loop = new CrawlLoop(st, CrawlQueries.Cfg)(spark)
    loop.init(SyntheticCorpus.seedsLocal(nHosts, 8),
      SyntheticCorpus.robotsLocal(nHosts).toDS())
    loop.run(
      SyntheticCorpus.docsLocal(nHosts).toDS().toDF(),
      SyntheticCorpus.hostDeathsLocal(nHosts).toDF("host", "dead_from_round"),
      rounds)
    dumpAndDiff(st, nHosts, rounds)
  }

  test("a differently-shaped crawl (45 hosts, 5 rounds) also matches the twin") {
    val python = Seq("bash", "-lc", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not available in this environment")
    runAndDiff(nHosts = 45, rounds = 5)
  }

  /** Degenerate shape: only 4 hosts, BELOW the bomb-host index, so the
    * subdomain-spam machinery never fires, the clone groups collapse and
    * the frontier drains — the no-bomb / near-empty branches of both
    * implementations must still agree exactly.
    */
  test("a tiny 4-host crawl (no bomb host, draining frontier) also matches the twin") {
    val python = Seq("bash", "-lc", "command -v python3").!!.trim
    assume(python.nonEmpty, "python3 not available in this environment")
    runAndDiff(nHosts = 4, rounds = 3)
  }
}

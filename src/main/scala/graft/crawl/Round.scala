package graft.crawl

import graft.analytics.Clones
import graft.dedup.SeenSet
import graft.extract.{ExtractedLink, SpanExtract}
import graft.frontier.{Politeness, RobotsGate}
import graft.model._
import graft.url.Urls
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row shapes used inside a round. */
final case class FetchInput(
    url: String, host: String, depth: Int, priority: Int, alive: Boolean,
    spans: Option[Seq[Span]])

final case class ParsedPage(
    url: String, host: String, depth: Int, title: String, content_sha1: String,
    links: Seq[ExtractedLink], media_refs: Seq[String], onions: Seq[String],
    emails: Seq[String], btcs: Seq[String], ssh_fps: Seq[String],
    ports: Seq[String], server: String, powered_by: String)

final case class RoundInputs(
    frontier: DataFrame,
    seen: DataFrame,
    domains: DataFrame,
    pages: DataFrame,
    corpus: DataFrame,
    /** distinct hosts present in the corpus — computed ONCE per run by the
      * loop (corpus is immutable), reused every round. Distinguishes a
      * 404 (live host, absent doc) from a connection failure (dead host).
      */
    corpusHosts: DataFrame,
    /** prepared ONCE per run by the loop (one collect/aggregation for the
      * whole crawl, not one per round). */
    robots: RobotsGate,
    hostDeaths: DataFrame,
    /** prefix-pruned access to the committed seen table (None = full
      * reads; see SeenSet.filterNew / SnapshotStore.readPrefixPruned). */
    seenPruner: Option[graft.dedup.SeenSet.Pruner] = None)

final case class RoundOutputs(
    frontierNext: DataFrame,
    seenDelta: DataFrame,
    domains: DataFrame,
    pagesDelta: DataFrame,
    ftsDelta: DataFrame,
    linksDelta: DataFrame,
    mediaDelta: DataFrame,
    emailsDelta: DataFrame,
    btcDelta: DataFrame,
    sshFpsDelta: DataFrame,
    portsDelta: DataFrame,
    crawlLogDelta: DataFrame,
    metricsDelta: DataFrame,
    scheduledCount: Long,
    cached: Seq[DataFrame])

/** ONE crawl round as a single DataFrame program (SURVEY.md §4.1).
  *
  * Intermediate reuse points are `localCheckpoint(eager = false)`, NOT
  * `persist()`: the round DAG shares subtrees heavily (parsed feeds six
  * sinks, the schedule five), and Catalyst renders DAG-shaped plans as
  * trees — duplicating shared subtrees — so with ~10 NESTED cached
  * levels the plan STRING grows exponentially. `persist()` forces that
  * rendering for every `CachedRDDBuilder.cachedName`, and every action
  * renders it again for the SQL-listener event: measured 2^31 characters
  * (OOM) on a two-round chain, and multi-second driver stalls per action
  * at bench scale. A lazy local checkpoint materializes on first use
  * exactly like a cache, but truncates lineage to a `LogicalRDD` leaf —
  * every downstream plan is shallow, rendering is O(nodes), and analysis
  * cost stops compounding. (Trade-off: truncated partitions cannot be
  * recomputed after executor loss — a re-run from the last snapshot is
  * the recovery path, which the resume contract guarantees anyway.)
  *
  *
  *   frontier ─robots gate─ politeness budget ─▶ scheduled (golden order)
  *     ─corpus equi-join─▶ fetched ─span parse─▶ pages/links/facts
  *     ─discoveries─ canonicalize+fingerprint ─batch dedup─ bloom+exact
  *     anti-join vs seen ─▶ frontier(r+1), seen delta, domains merge
  *
  * Determinism: every value is a pure function of the committed state —
  * no wall-clock, no RNG, no partition-dependent ids. Crawl order is the
  * normative total order (priority DESC, enqueue_seq ASC, url ASC).
  */
object Round {

  // hot-path URL functions as native Catalyst expressions (codegen'd,
  // null-safe, no per-row boxing) — see graft.functions.UrlExpressions
  private def hostUdf(c: org.apache.spark.sql.Column) =
    graft.functions.UrlExpressions.url_host(c)
  private def pathUdf(c: org.apache.spark.sql.Column) =
    graft.functions.UrlExpressions.url_path(c)
  private def fpUdf(c: org.apache.spark.sql.Column) =
    graft.functions.UrlExpressions.url_fingerprint(c)
  // EnqueueSeq.forDiscovered / forRequeue (graft.url.EnqueueSeq) as
  // column arithmetic over the native in-place fnv1a64 expression — the
  // previous Scala UDFs decoded each URL to a String per discovered
  // link. Bit-layout identical (the frozen goldens pin it).
  private def discSeqCol(r: Int, parent: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column) =
    shiftleft(lit(r.toLong), 44)
      .bitwiseOR(shiftleft(
        graft.functions.UrlExpressions.fnv1a64(parent).bitwiseAND(lit(0xffffffffL)), 12))
      .bitwiseOR(least(pos, lit(4095)).cast("long"))
  private def requeueSeqCol(r: Int, u: org.apache.spark.sql.Column) =
    shiftleft(lit(r.toLong), 44)
      .bitwiseOR(graft.functions.UrlExpressions.fnv1a64(u).bitwiseAND(lit(0xfffffffffffL)))

  private val frontierCols =
    Seq("url", "host", "priority", "tier", "depth", "enqueue_seq",
      "discovered_from", "round", "retries")

  def run(
      in: RoundInputs,
      cfg: CrawlConfig,
      round: Int,
      seqBase: Long,
      seenSet: SeenSet,
      /** size hint for the round's URL Bloom — the previous round's
        * scheduled count (Loop) with the frontier count as first-round
        * fallback; GoldenSeq caps it at MaxBloomItems. Only affects
        * prefilter FPP, never results. */
      schedHint: Long = 1 << 16)(implicit spark: SparkSession): RoundOutputs = {
    import spark.implicits._

    // ---- 1. eligibility: drop retired (dead_in_a_row >= R) + crap hosts.
    // domains/corpusHosts-scale sides carry SHUFFLE_HASH hints throughout
    // the round: they grow with the crawl (too big to broadcast at 100×,
    // where the planner would shuffle anyway), and in local mode the
    // planner's file-size-based broadcast choice costs a 5-9s
    // SINGLE-THREADED hash-relation build per join per round (profiled) —
    // a per-round serial tail that caps multi-core scaling. A shuffled
    // hash join builds per-partition maps in parallel instead.
    val dinfo = in.domains.select(
      col("host"), col("dead_in_a_row"), col("is_crap"), col("pages_crawled"))
    val eligible = in.frontier
      .join(dinfo.hint("shuffle_hash"), Seq("host"), "left")
      .filter(coalesce(col("is_crap"), lit(false)) === false)
      .filter(coalesce(col("dead_in_a_row"), lit(0)) < cfg.deadRetireThreshold)
      // project the consumed filter columns away BEFORE the gate +
      // checkpoint: everything downstream (politeness, carryover, crawl
      // log) needs only the frontier columns + pages_crawled, so
      // is_crap/dead_in_a_row would otherwise ride the round's cached
      // blocks and every later exchange for nothing
      .select((frontierCols.map(col) :+ col("pages_crawled")): _*)

    // ---- 2. robots gate: denied rows are consumed (logged), never fetched.
    // Cached: re-used by the carry-over anti-join, next-frontier build and
    // per-partition metrics — without the cache every sink that reaches it
    // re-runs the eligibility joins + gate resolution.
    val gated = in.robots(eligible).localCheckpoint(false)
    val denied = gated.filter(!col("robots_allowed"))
    val allowed = gated.filter(col("robots_allowed"))

    // ---- 3. politeness budget (two-phase skew-safe top-k per host),
    // cached before the range exchange so its sampling pass and the
    // shuffle read the window output once, then laid out as ordered
    // ranges of the normative crawl order for the sequencer
    // drop the gate/budget columns (robots_allowed, crawl_delay,
    // pages_crawled) the schedule has fully consumed: the range exchange,
    // both schedule checkpoints and the carryover anti-join need only the
    // frontier columns
    val sched0 = Politeness.schedule(allowed, cfg)
      .select(frontierCols.map(col): _*).localCheckpoint(false)
    val scheduled =
      GoldenSeq.layout(sched0, spark.sessionState.conf.numShufflePartitions)
    val carryover = allowed
      .join(scheduled.select("url").hint("shuffle_hash"), Seq("url"), "left_anti")
      .select(col("url"), col("host"), col("priority"), col("tier"), col("depth"),
        col("enqueue_seq"), col("discovered_from"), lit(round + 1).as("round"),
        col("retries"))

    // ---- 4. ONE stats job (per-range counts + total + URL Bloom), then
    // the golden crawl log as a zero-shuffle per-partition sequence —
    // replaces the single-task `row_number() OVER (ORDER BY ...)` plus
    // separate count() and stat.bloomFilter() jobs of the naive shape
    val st = GoldenSeq.stats(scheduled, math.max(1024L, schedHint))
    val scheduledCnt = st.total
    val crawlLogDelta = GoldenSeq.assign(scheduled, st, round, seqBase)

    // ---- 5. corpus fetch join (S3/J3). Outcome model mirrors HTTP:
    //   doc found on a live host          -> 200, parse
    //   doc absent but host serves others -> 404 (permanent, NO retry)
    //   host absent from corpus / death-scheduled -> connection failure
    //     (dead-host signal: dead_in_a_row++, retry tier)
    //
    // The corpus side is FAT (spans). A plain join shuffles+sorts every
    // document every round; instead a ~1MB Bloom over this round's
    // scheduled URLs (already built by the stats job) prefilters the
    // corpus map-side, so only actually-fetched docs (+ FP noise) reach
    // the shuffle. Exactness is unaffected: the equi-join discards Bloom
    // false positives.
    val urlBloom = spark.sparkContext.broadcast(st.urlBloom)
    val corpusPruned = in.corpus.filter(
      graft.functions.BloomProbe.mightContain(urlBloom, col("doc_id")))
    // narrow the probe side BEFORE the fetch-join exchange: of the
    // schedule's 9 columns the fetch result only ever consumes these 5 —
    // in particular discovered_from (a full URL string) and enqueue_seq
    // would otherwise ride the round's biggest shuffle AND the fat
    // checkpointed fetch result for nothing (retry entries rebuild their
    // enqueue_seq from the URL, carryover comes from `allowed`)
    val fetchIn = scheduled
      .select(col("url"), col("host"), col("depth"), col("priority"), col("retries"))
    val joined = fetchIn
      .join(corpusPruned, fetchIn("url") === corpusPruned("doc_id"), "left")
      .join(broadcast(in.hostDeaths), Seq("host"), "left")
      .join(in.corpusHosts.withColumn("host_in_corpus", lit(true))
        .hint("shuffle_hash"), Seq("host"), "left")
      .withColumn("host_alive",
        coalesce(col("host_in_corpus"), lit(false)) &&
          coalesce(col("dead_from_round"), lit(Int.MaxValue)) > round)
      .withColumn("alive", col("doc_id").isNotNull && col("host_alive"))
      // checkpoint exactly the consumed columns (drops dead_from_round /
      // host_in_corpus and the corpus side's non-span extras): the cached
      // blocks are copied row-by-row into storage, so width here is paid
      // three times — copy, SizeEstimator sampling, and every re-read
      .select(col("url"), col("host"), col("depth"), col("priority"),
        col("retries"), col("doc_id"), col("spans"), col("host_alive"),
        col("alive"))
      .localCheckpoint(false)

    // ---- 6. parse spans (one typed pass, SURVEY.md U5)
    val parsed: Dataset[ParsedPage] = joined
      .select(col("url"), col("host"), col("depth"), col("priority"),
        col("alive"), col("spans"))
      .as[FetchInput]
      .filter(_.alive)
      .map { f =>
        val p = SpanExtract.parse(f.url, f.spans.getOrElse(Seq.empty))
        ParsedPage(f.url, f.host, f.depth, p.title, p.content_sha1,
          p.links, p.media_refs, p.onions, p.emails, p.btcs, p.ssh_fps,
          p.ports, p.server, p.powered_by)
      }
      .localCheckpoint(false)

    // connection failures only — the dead-host signal
    val misses = joined.filter(!col("host_alive"))
      .select(col("url"), col("host"), col("depth"), col("retries")).localCheckpoint(false)
    // 404s: live host, absent doc — recorded, never retried
    val notFound = joined.filter(col("host_alive") && col("doc_id").isNull)
      .select(col("url"), col("host"))

    // ---- 7. output tables of this round
    val pagesOk = parsed
      .select(col("url"), col("host"), lit(200).as("status"), col("title"),
        (pathUdf(col("url")) === lit("/")).as("is_frontpage"),
        lit(round).as("visited_round"), col("content_sha1"))
    val pagesMiss = misses
      .select(col("url"), col("host"), lit(0).as("status"), lit("").as("title"),
        (pathUdf(col("url")) === lit("/")).as("is_frontpage"),
        lit(round).as("visited_round"), lit(null).cast("string").as("content_sha1"))
    val pages404 = notFound
      .select(col("url"), col("host"), lit(404).as("status"), lit("").as("title"),
        (pathUdf(col("url")) === lit("/")).as("is_frontpage"),
        lit(round).as("visited_round"), lit(null).cast("string").as("content_sha1"))
    val pagesDelta = pagesOk.unionByName(pagesMiss).unionByName(pages404)

    // FTS index delta (K2): the round's fetched pages tokenized into RAW
    // postings appended to the committed `pages_fts` table by the loop's
    // combined write — the reference's per-crawl Elasticsearch indexing.
    // ZERO extra scans, joins or shuffles: body terms come from the
    // already-checkpointed fetch result (`joined` carries the spans),
    // title terms from `parsed`; both are map-side explodes that flow
    // straight into the partitioned write. (Building from pages ⋈ corpus
    // here instead would re-scan + re-join the corpus per round, and a
    // per-round (term,url) dedup shuffle was measured at ~35% of crawl
    // throughput — query-side dedup after the term filter is free.)
    val bodyText = array_join(transform(
      filter(col("spans"), s => s.getField("kind") === "text"),
      s => s.getField("text")), " ")
    val ftsDelta = parsed
      .select(col("url"), col("host"),
        explode(graft.analytics.Search.tokenize(col("title"))).as("term"),
        lit(true).as("in_title"))
      .unionByName(joined.filter(col("alive"))
        .select(col("url"), col("host"),
          explode(graft.analytics.Search.tokenize(bodyText)).as("term"),
          lit(false).as("in_title")))
      .select(col("term"), col("url"), col("host"), col("in_title"),
        lit(round).as("round"))

    val linksDelta = parsed
      .select(col("url").as("src_url"), col("host").as("src_host"),
        explode(col("links")).as("l"))
      .select(col("src_url"), col("l.dst_url").as("dst_url"), col("src_host"),
        hostUdf(col("l.dst_url")).as("dst_host"), lit(round).as("round"))

    // media half of the interleaved span contract: every media_ref of a
    // fetched page, span-ordered (posexplode keeps the order the parse
    // emitted, which is span order)
    val mediaDelta = parsed
      .select(col("url"), col("host"), posexplode(col("media_refs")).as(Seq("pos", "media_ref")))
      .select(col("url"), col("host"), col("media_ref"), col("pos"),
        lit(round).as("round"))

    def factDelta(arrayCol: String): DataFrame = parsed
      .select(col("host"), explode(col(arrayCol)).as("value"))
      .distinct()
      .withColumn("round", lit(round))
    val emailsDelta = factDelta("emails")
    val btcDelta = factDelta("btcs")
    val sshFpsDelta = factDelta("ssh_fps")
    val portsDelta = factDelta("ports")

    // ---- 8. discoveries: anchors (span order) + plain-text onion mentions
    val anchorCand = parsed
      .select(col("url").as("discovered_from"), col("depth"), explode(col("links")).as("l"))
      .select(col("discovered_from"), (col("depth") + 1).as("depth"),
        col("l.dst_url").as("url"), col("l.pos").as("pos"))
    val mentionCand = parsed
      .select(col("url").as("discovered_from"), col("depth"),
        posexplode(col("onions")).as(Seq("mpos", "mhost")))
      .select(col("discovered_from"), (col("depth") + 1).as("depth"),
        concat(lit("http://"), col("mhost"), lit("/")).as("url"),
        (col("mpos") + lit(2048)).as("pos"))

    val candidates = anchorCand.unionByName(mentionCand)
      .filter(col("depth") <= cfg.maxDepth)
      .withColumn("host", hostUdf(col("url")))
      .withColumn("enqueue_seq", discSeqCol(round + 1, col("discovered_from"), col("pos")))
      .withColumn("fingerprint", fpUdf(col("url")))

    // batch dedup: one hash agg (map-side partial), deterministic arg-min
    val bestPerFp = candidates
      .groupBy(col("fingerprint"))
      .agg(min_by(
        struct(col("url"), col("host"), col("depth"), col("enqueue_seq"),
          col("discovered_from")),
        struct(col("enqueue_seq"), col("discovered_from"))).as("e"))
      .select(col("fingerprint"), col("e.*"))
      .localCheckpoint(false)

    // two-phase bloom + exact anti-join vs seen (J2); cached — consumed by
    // crap detection (with a collect), seen delta, frontier and metrics
    // prefix pruning pays only when the Bloom-positive candidates touch
    // few prefix partitions. Candidates scale with the schedule, so gate
    // on the ALREADY-KNOWN scheduled count: above ~the prefix-space size
    // the candidates cover most partitions (coupon-collector) and the
    // prune would burn its distinct-prefix job just to fall back to the
    // full read — measured −10% crawl throughput at bench scale before
    // this gate. Wrong gate decisions only cost speed, never rows.
    val pruner = in.seenPruner.filter(p =>
      scheduledCnt <= (1L << (4 * math.min(7, p.prefixLen))))
    val fresh0 = seenSet.filterNew(bestPerFp, in.seen, pruner).localCheckpoint(false)

    // subdomain-spam (is_crap) detection on the fresh candidate hosts —
    // the (tiny) bomb-base set stays distributed: a broadcast anti-join
    // here and a broadcast left join in the domains merge, NO driver
    // collect (the collect was a dedicated per-round job)
    val baseExpr = regexp_extract(col("host"), "([a-z2-7]{16}|[a-z2-7]{56})\\.onion$", 0)
    val crapBases = fresh0
      .groupBy(baseExpr.as("base"))
      .agg(countDistinct(col("host")).as("n_sub"))
      .filter(col("n_sub") > cfg.crapSubdomainLimit && col("base") =!= "")
      .select(col("base"))
      .localCheckpoint(false)
    val fresh = fresh0
      .withColumn("base", baseExpr)
      .join(broadcast(crapBases), Seq("base"), "left_anti")
      .drop("base")
      .localCheckpoint(false)

    val seenDelta = fresh
      .select(col("fingerprint"), col("url"), lit(round + 1).as("first_round"))

    val newEntries = fresh.select(
      col("url"), col("host"), lit(Priorities.NewOnion).as("priority"),
      lit(Priorities.TierNew).as("tier"), col("depth"), col("enqueue_seq"),
      col("discovered_from"), lit(round + 1).as("round"), lit(0).as("retries"))

    // ---- 9. retry tier: failed hosts not yet retired re-enqueue the URL
    val priorDead = in.domains.select(col("host"), col("dead_in_a_row").as("prior_dead"))
    val missHostsD = misses.select("host").distinct()
      .join(priorDead.hint("shuffle_hash"), Seq("host"), "left")
      .withColumn("dead_now", coalesce(col("prior_dead"), lit(0)) + 1)
      .localCheckpoint(false)
    // per-URL retry cap (Scrapy RetryMiddleware semantics) on top of the
    // host-level retirement — otherwise one permanent 404 on a healthy
    // host would be retried forever and the host would never go stale
    val retryEntries = misses
      .filter(col("retries") < cfg.maxUrlRetries)
      .join(missHostsD.filter(col("dead_now") < cfg.deadRetireThreshold)
        .select("host"), Seq("host"), "left_semi")
      .select(col("url"), col("host"), lit(Priorities.Retry).as("priority"),
        lit(Priorities.TierRetry).as("tier"), col("depth"),
        requeueSeqCol(round + 1, col("url")).as("enqueue_seq"),
        lit("").as("discovered_from"), lit(round + 1).as("round"),
        (col("retries") + 1).as("retries"))

    // ---- 10. recrawl tier: stalest-first due domains re-enqueue frontpage
    val dueRecrawl = in.domains
      .filter(col("is_up") && !col("is_crap") &&
        col("dead_in_a_row") < cfg.deadRetireThreshold &&
        col("last_visited_round") <= round - cfg.recrawlIntervalRounds)
      .select(concat(lit("http://"), col("host"), lit("/")).as("url"), col("host"))
      .select(col("url"), col("host"), lit(Priorities.Recrawl).as("priority"),
        lit(Priorities.TierRecrawl).as("tier"), lit(0).as("depth"),
        requeueSeqCol(round + 1, col("url")).as("enqueue_seq"),
        lit("").as("discovered_from"), lit(round + 1).as("round"),
        lit(0).as("retries"))

    // ---- 11. next frontier: deterministic merge, best entry per url
    val frontierNext = carryover.select(frontierCols.map(col): _*)
      .unionByName(newEntries.select(frontierCols.map(col): _*))
      .unionByName(retryEntries.select(frontierCols.map(col): _*))
      .unionByName(dueRecrawl.select(frontierCols.map(col): _*))
      .groupBy(col("url"))
      .agg(min_by(
        struct(frontierCols.filter(_ != "url").map(col): _*),
        struct((lit(Priorities.NewOnion) - col("priority")).as("inv_priority"),
          col("enqueue_seq"))).as("e"))
      .select((Seq(col("url")) ++ frontierCols.filter(_ != "url").map(n => col(s"e.$n"))): _*)
      .localCheckpoint(false) // consumed by the frontier write AND the new-host probe

    // ---- 12. domains merge (K1 upsert = full-outer + coalesce)
    // any HTTP response (200 or 404) counts as "host alive" observation;
    // fetched_pages counts parsed 200s only
    val titleAgg = parsed.groupBy(col("host")).agg(
      max(when(pathUdf(col("url")) === "/", col("title"))).as("fp_title"),
      // header facts: empty string = "not observed" (never overwrites)
      max(when(col("server") =!= "", col("server"))).as("obs_server"),
      max(when(col("powered_by") =!= "", col("powered_by"))).as("obs_powered_by"))
    val okHostAgg = joined.filter(col("host_alive"))
      .groupBy(col("host"))
      .agg(sum(when(col("alive"), lit(1)).otherwise(lit(0))).as("fetched_pages"))
      .join(titleAgg, Seq("host"), "left")
    val obs = okHostAgg
      .join(missHostsD.select(col("host"), col("dead_now")), Seq("host"), "full_outer")
    val newHostRows = frontierNext.select("host").distinct()
      .join(in.domains.select("host").hint("shuffle_hash"), Seq("host"), "left_anti")
      .join(obs.select("host").hint("shuffle_hash"), Seq("host"), "left_anti")
      .localCheckpoint(false)

    val mergedBase = in.domains
      .join(obs, Seq("host"), "full_outer")
      .join(newHostRows.withColumn("is_new_host", lit(true)), Seq("host"), "left")
      .withColumn("base", baseExpr)
      .join(broadcast(crapBases.withColumn("is_bomb_base", lit(true))),
        Seq("base"), "left")
      .drop("base")
      .select(
        col("host"),
        coalesce(col("first_seen_round"),
          when(col("is_new_host"), lit(round + 1)).otherwise(lit(round))).as("first_seen_round"),
        when(col("fetched_pages").isNotNull || col("dead_now").isNotNull, lit(round))
          .otherwise(coalesce(col("last_visited_round"), lit(-1))).as("last_visited_round"),
        when(col("fetched_pages").isNotNull, lit(round))
          .otherwise(coalesce(col("last_alive_round"), lit(-1))).as("last_alive_round"),
        when(col("fetched_pages").isNotNull, lit(true))
          .when(col("dead_now").isNotNull, lit(false))
          .otherwise(coalesce(col("is_up"), lit(false))).as("is_up"),
        when(col("fetched_pages").isNotNull, lit(0))
          .otherwise(coalesce(col("dead_now"), col("dead_in_a_row"), lit(0))).as("dead_in_a_row"),
        coalesce(col("fp_title"), col("title"), lit("")).as("title"),
        coalesce(col("obs_server"), col("server"), lit("")).as("server"),
        coalesce(col("obs_powered_by"), col("powered_by"), lit("")).as("powered_by"),
        (coalesce(col("is_crap"), lit(false)) ||
          coalesce(col("is_bomb_base"), lit(false))).as("is_crap"),
        lit(false).as("is_fake"),
        lit("").as("genuine_host"),
        (coalesce(col("pages_crawled"), lit(0)) +
          coalesce(col("fetched_pages"), lit(0))).cast("int").as("pages_crawled"))

    // clone / fake marking over the accumulated front pages (A5/A6/J6)
    val frontPagesAll = in.pages.unionByName(pagesDelta)
      .filter(col("is_frontpage") && col("content_sha1").isNotNull)
      .groupBy(col("host"))
      .agg(max_by(col("content_sha1"), col("visited_round")).as("content_sha1"))
    // first-seen source: the COMMITTED domains table, not mergedBase —
    // avoids evaluating the merge DAG twice in one write. Equivalent
    // outcome: hosts absent there (first seen this round) rank as
    // "newest" either way and tie-break by host name.
    val cloneFlags = Clones.detect(frontPagesAll,
      in.domains.select(col("host"), col("first_seen_round")))
    val domainsNext = mergedBase
      .join(cloneFlags.withColumnRenamed("is_fake", "cf_fake")
        .withColumnRenamed("genuine_host", "cf_genuine"), Seq("host"), "left")
      .withColumn("is_fake", coalesce(col("cf_fake"), col("is_fake")))
      .withColumn("genuine_host", coalesce(col("cf_genuine"), col("genuine_host")))
      .drop("cf_fake", "cf_genuine")

    // ---- 13. per-partition lineage + metrics (A7, NORM): ONE job — each
    // source tagged and unioned, a single shuffle pivots the counts into
    // columns (the previous 6-aggregate/5-join formulation cost ~10s of
    // driver planning+codegen per round on its own).
    def tag(df: DataFrame, name: String): DataFrame = df
      .select(spark_partition_id().as("partition_id"), lit(name).as("m"))
    val dropped = bestPerFp.join(fresh.select("fingerprint"), Seq("fingerprint"), "left_anti")
    val tagged = Seq(
      tag(in.frontier, "urls_in"), tag(denied, "denied"),
      tag(dropped, "deduped"), tag(scheduled, "scheduled"),
      tag(parsed.toDF(), "fetched"), tag(newHostRows, "new_onions"))
      .reduce(_ unionByName _)
    def cnt(name: String) =
      sum(when(col("m") === name, 1L).otherwise(0L)).as(name)
    val metricsDelta = tagged
      .groupBy(col("partition_id"))
      .agg(cnt("urls_in"), cnt("denied"), cnt("deduped"), cnt("scheduled"),
        cnt("fetched"), cnt("new_onions"))
      .select(lit(round).as("round"), col("partition_id"), col("urls_in"),
        col("denied"), col("deduped"), col("scheduled"), col("fetched"),
        col("new_onions"))

    RoundOutputs(
      frontierNext = frontierNext,
      seenDelta = seenDelta,
      domains = domainsNext,
      pagesDelta = pagesDelta,
      ftsDelta = ftsDelta,
      linksDelta = linksDelta,
      mediaDelta = mediaDelta,
      emailsDelta = emailsDelta,
      btcDelta = btcDelta,
      sshFpsDelta = sshFpsDelta,
      portsDelta = portsDelta,
      crawlLogDelta = crawlLogDelta,
      metricsDelta = metricsDelta,
      scheduledCount = scheduledCnt,
      cached = Seq(gated, sched0, scheduled, joined, parsed.toDF(), misses,
        bestPerFp, fresh0, crapBases, fresh, missHostsD, newHostRows,
        frontierNext))
  }
}

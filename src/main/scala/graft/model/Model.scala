package graft.model

/** Typed row models for every engine table (SURVEY.md §2.2). Field names
  * are snake_case so `Encoders.product` derives the exact on-disk column
  * names — one source of truth for schema.
  *
  * The corpus shape is normative (`BASELINE.json` input_hint):
  *   documents(doc_id: string,
  *             spans: array<struct<kind,text,media_ref,offset>>)
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

final case class Doc(doc_id: String, spans: Seq[Span])

/** tier ∈ {new, recrawl, retry}; priority new=2 > recrawl=1 > retry=0. */
final case class FrontierEntry(
    url: String,
    host: String,
    priority: Int,
    tier: String,
    depth: Int,
    enqueue_seq: Long,
    discovered_from: String,
    round: Int,
    retries: Int)

final case class Seen(fingerprint: String, url: String, first_round: Int)

final case class DomainRow(
    host: String,
    first_seen_round: Int,
    last_visited_round: Int,
    last_alive_round: Int,
    is_up: Boolean,
    dead_in_a_row: Int,
    title: String,
    server: String,
    powered_by: String,
    is_crap: Boolean,
    is_fake: Boolean,
    genuine_host: String,
    pages_crawled: Int)

final case class PageRow(
    url: String,
    host: String,
    status: Int,
    title: String,
    is_frontpage: Boolean,
    visited_round: Int,
    content_sha1: String)

final case class LinkRow(
    src_url: String,
    dst_url: String,
    src_host: String,
    dst_host: String,
    round: Int)

/** Inverted-lookup fact rows (emails / btc addresses / ssh fps / ports). */
final case class FactRow(host: String, value: String, round: Int)

/** Media references observed in fetched pages' interleaved spans
  * (kind = "media") — the media half of the input contract's
  * text+media span sequences, kept span-ordered via `pos`.
  */
final case class MediaRefRow(
    url: String, host: String, media_ref: String, pos: Int, round: Int)

final case class RobotsRule(
    host: String,
    path_prefix: String,
    allow: Boolean,
    crawl_delay: Double)

/** Committed inverted FTS index row (SURVEY.md §3.1 K2): maintained
  * incrementally on the crawl cadence like the reference's Elasticsearch
  * index; `round` drives TTL expiry alongside `pages`.
  */
final case class FtsRow(
    term: String,
    url: String,
    host: String,
    in_title: Boolean,
    round: Int)

/** The golden crawl-order output — first-class table (SURVEY.md §3.1 K5). */
final case class CrawlLogEntry(
    seq: Long,
    round: Int,
    url: String,
    host: String,
    priority: Int)

/** Per-partition lineage + metrics (BASELINE.json north_rule). */
final case class MetricsRow(
    round: Int,
    partition_id: Int,
    urls_in: Long,
    denied: Long,
    deduped: Long,
    scheduled: Long,
    fetched: Long,
    new_onions: Long)

/** Politeness / crawl policy (FIXTURES.md B4). All knobs logical — no
  * wall-clock anywhere in crawl semantics (determinism contract §6).
  */
final case class CrawlConfig(
    maxDepth: Int = 4,
    maxPagesPerDomain: Int = 50,
    roundWindowSec: Double = 60.0,
    defaultCrawlDelaySec: Double = 10.0,
    deadRetireThreshold: Int = 3,
    recrawlIntervalRounds: Int = 5,
    saltBuckets: Int = 16,
    bloomExpectedItems: Long = 1000000L,
    bloomFpp: Double = 0.03,
    crapSubdomainLimit: Int = 20,
    compactEveryRounds: Int = 4,
    maxUrlRetries: Int = 2,
    /** retention: page rows older than this many rounds are dropped at
      * compaction (Int.MaxValue = keep forever). */
    pageTtlRounds: Int = Int.MaxValue,
    /** seen-filter shards = 2^bits (SeenSet scaladoc): 0 = one filter,
      * map-side probe (default); >0 = per-shard broadcasts with
      * co-partitioned probes for the 10^10 multi-GB-filter regime. */
    seenShardBits: Int = 0,
    /** compacted `seen` is laid out in 16^len fingerprint-prefix
      * partitions so the exact anti-join reads ONLY the partitions its
      * Bloom-positive candidates touch instead of re-shuffling the full
      * 10^10-row table every round (SnapshotStore.compact hashPrefix +
      * SeenSet.filterNew). 2 ⇒ 256 dirs (sandbox default); 3 ⇒ 4096
      * (~2.4M rows/dir at 10^10 — the 100-TB setting). 0 disables. */
    seenPrefixLen: Int = 2) {

  /** budget(host) = min(max(1, floor(roundWindow / crawlDelay(host))),
    * floor(roundWindow / minDelaySec)) — the upper clamp mirrors
    * Politeness.schedule exactly: the two-phase top-k is only exact when
    * phase 1 keeps ≥ budget rows per host, so a robots-supplied
    * crawl_delay below `minDelaySec` must not push the budget past the
    * phase-1 cap (the effective floor on delay is minDelaySec).
    */
  def budget(crawlDelay: Double, minDelaySec: Double = 1.0): Int = {
    val cap = math.max(1, math.floor(roundWindowSec / minDelaySec).toInt)
    val d = if (crawlDelay > 0) crawlDelay else defaultCrawlDelaySec
    math.min(math.max(1, math.floor(roundWindowSec / d).toInt), cap)
  }
}

object Priorities {
  val NewOnion = 2
  val Recrawl = 1
  val Retry = 0
  val TierNew = "new"
  val TierRecrawl = "recrawl"
  val TierRetry = "retry"
}

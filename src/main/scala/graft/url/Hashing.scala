package graft.url

/** Stable 64-bit hashing, pure Scala (no Spark dep) — used to derive
  * deterministic, partition-independent `enqueue_seq` values and fixture
  * content. NEVER use `monotonically_increasing_id` (partition-dependent)
  * for anything semantic (SURVEY.md §9.5 hard part #1).
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes; stable across JVMs. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 — good avalanche for integer seeds (fixture generation). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def nonNeg(h: Long): Long = h & 0x7fffffffffffffffL
}

/** Deterministic `enqueue_seq` assignment (SURVEY.md §6.3).
  *
  * The reference's insertion order is the arrival order in Scrapy's
  * scheduler; with randomness pinned off the replay contract makes it a
  * pure function of (discovery round, parent URL, link position in the
  * parent's span order):
  *
  *   bits 63..44 : round the entry was enqueued in   (FIFO across rounds)
  *   bits 43..12 : fnv1a64(parent canonical URL) low 32 bits
  *   bits 11..0  : link position within the parent (span-order), capped
  *
  * Seeds are round-0 entries: a 44-bit hash of the seed's own canonical
  * URL, so every seed sorts before any discovered/requeued entry (FIFO
  * across rounds holds for round 0 too) with a deterministic intra-seed
  * order. Collisions are harmless: the total crawl order adds
  * `canonical_url ASC` as the final tie-break (SURVEY.md §6.1 O1).
  */
object EnqueueSeq {
  def forSeed(canonUrl: String): Long =
    (Hashing.fnv1a64(canonUrl) & 0xfffffffffffL)

  def forDiscovered(enqueueRound: Int, parentCanon: String, linkPos: Int): Long =
    (enqueueRound.toLong << 44) |
      ((Hashing.fnv1a64(parentCanon) & 0xffffffffL) << 12) |
      math.min(linkPos, 4095).toLong

  def forRequeue(enqueueRound: Int, canonUrl: String): Long =
    (enqueueRound.toLong << 44) | (Hashing.fnv1a64(canonUrl) & 0xfffffffffffL)
}

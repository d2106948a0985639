package graft.fixtures

import graft.model._
import graft.url.Hashing

/** Deterministic synthetic corpus in the normative `input_hint` shape
  * (FIXTURES.md B1): every value is a pure function of (hostIdx, pageIdx) —
  * no wall-clock, no RNG state. Includes on purpose:
  *   - a hot domain (hostIdx 0) receiving ~30% of cross-host links (skew)
  *   - clone pairs with identical span content (clone detection)
  *   - hosts that die from round k (alive/dead transitions)
  *   - duplicate link variants differing only in fragment / query order
  *     (canonicalization + dedup)
  *   - robots-denied paths, per-host crawl delays (politeness)
  *   - onion mentions in plain text, emails, btc addresses (regex ops)
  *
  * Scales by `nHosts`: total pages ≈ nHosts * avgPagesPerHost.
  */
object SyntheticCorpus {

  private val Base32 = "abcdefghijklmnopqrstuvwxyz234567"

  /** base32 host label: v3 (56 chars) for every 7th host, else v2 (16). */
  def hostName(i: Long): String = {
    val len = if (i % 7 == 0) 56 else 16
    val sb = new StringBuilder(len + 6)
    var h = Hashing.mix(i * 31 + 7)
    var k = 0
    while (k < len) {
      if (k % 12 == 0) h = Hashing.mix(h + k)
      sb.append(Base32((h >>> ((k % 12) * 5)).toInt & 31))
      k += 1
    }
    sb.append(".onion")
    sb.toString
  }

  def pagesPerHost(i: Long): Int = 3 + (Hashing.nonNeg(Hashing.mix(i * 13 + 1)) % 5).toInt

  /** Clone pairs: every 10th host (i%10==9) clones host i-1's content. */
  def cloneSource(i: Long): Long = if (i % 10 == 9) i - 1 else i

  /** Hosts i%11==3 die from round `deadFromRound`; -1 = never dies. */
  def deadFromRound(i: Long): Int = if (i % 11 == 3) 2 else -1

  /** Hosts i%13==5 are linked-to but have no documents at all (dead from
    * the start — corpus-join miss on first fetch).
    */
  def isGhost(i: Long): Boolean = i % 13 == 5

  /** Canonical document URL. Non-frontpage docs carry a (sorted) query so
    * link variants with unsorted params / fragments exercise R1
    * canonicalization and still resolve to a real document.
    */
  def urlOf(i: Long, p: Int): String =
    if (p == 0) s"http://${hostName(i)}/" else s"http://${hostName(i)}/p$p?a=1&b=2"

  private def pick(h: Long, n: Long): Long = Hashing.nonNeg(h) % n

  /** Cross-host link target: ~30% to the hot domain (host 0). */
  def crossTarget(i: Long, p: Int, nHosts: Long, slot: Int): Long = {
    val h = Hashing.mix(i * 1009 + p * 131 + slot)
    if (Hashing.nonNeg(h) % 10 < 3 && i != 0) 0L
    else pick(Hashing.mix(h + 1), nHosts)
  }

  private val Words = Vector("onion", "market", "forum", "mirror", "hidden",
    "service", "index", "directory", "fresh", "links", "secure", "anon",
    "wiki", "board", "chat", "mail", "host", "search", "paste", "drop")

  private def fillerText(seed: Long, n: Int): String = {
    val sb = new StringBuilder
    var h = seed
    var k = 0
    while (k < n) {
      h = Hashing.mix(h)
      sb.append(Words((Hashing.nonNeg(h) % Words.length).toInt)).append(' ')
      k += 1
    }
    sb.toString.trim
  }

  def titleOf(i: Long, p: Int): String = {
    val src = cloneSource(i)
    s"${fillerText(Hashing.mix(src * 97 + p), 3)} ${src % 1000}-$p"
  }

  /** Valid-shape BTC address: [13][a-km-zA-HJ-NP-Z1-9]{25,34}. */
  def btcOf(seed: Long): String = {
    val alpha = "abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789"
    val sb = new StringBuilder("1")
    var h = seed
    var k = 0
    while (k < 30) {
      if (k % 10 == 0) h = Hashing.mix(h + k)
      sb.append(alpha((Hashing.nonNeg(h >>> ((k % 10) * 6)) % alpha.length).toInt))
      k += 1
    }
    sb.toString
  }

  def emailOf(i: Long): String = s"admin${cloneSource(i) % 50}@mail${cloneSource(i) % 20}.onion"

  /** SSH host-key fingerprint — clones share their source's key (the
    * infrastructure-reuse evidence the reference's maintenance scripts
    * correlate with content clones). Alphabet is [A-Za-z0-9] only and the
    * payload starts with 'g', so the fingerprint can never collide with
    * the btc (`\b[13]...`), email or onion regexes.
    */
  def sshFpOf(i: Long): String = {
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    val src = cloneSource(i)
    val sb = new StringBuilder("SHA256:g")
    var h = Hashing.mix(src * 41 + 11)
    var k = 0
    while (k < 42) {
      if (k % 10 == 0) h = Hashing.mix(h + k)
      sb.append(alpha((Hashing.nonNeg(h >>> ((k % 10) * 6)) % alpha.length).toInt))
      k += 1
    }
    sb.toString
  }

  /** Open ports — infrastructure facts, shared with the clone source. */
  def portsOf(i: Long): Seq[Int] = {
    val src = cloneSource(i)
    Seq(22, 80) ++ (if (src % 3 == 0) Seq(443) else Nil) ++
      (if (src % 4 == 1) Seq(8080) else Nil)
  }

  private val Servers =
    Vector("nginx/1.14.2", "Apache/2.4.38", "Caddy", "lighttpd/1.4.53")
  private val PoweredBys = Vector("PHP/7.3.4", "Express", "Django/2.2", "")

  /** Response-header facts (the reference records Server / X-Powered-By
    * per domain). Keyed on the OWN host — a mirror on different
    * infrastructure can run a different stack, and header spans are
    * kind="header" so they never enter the body content hash.
    */
  def serverOf(i: Long): String =
    Servers((Hashing.nonNeg(Hashing.mix(i * 53 + 3)) % Servers.length).toInt)
  def poweredByOf(i: Long): String =
    PoweredBys((Hashing.nonNeg(Hashing.mix(i * 59 + 5)) % PoweredBys.length).toInt)

  /** Subdomain-bomb host (F6 positive case): its p1 page links to
    * `BombSubdomains` subdomains of its own base — more than the default
    * `crapSubdomainLimit`, so the engine must mark the base crap and never
    * schedule the subdomains.
    */
  val BombHost: Long = 4L
  val BombSubdomains: Int = 25

  /** The spans of page p on host i — document order, offsets strictly
    * increasing. Clone hosts serve their source's HTML byte-identically
    * (a mirror): every text span — including the link span's absolute
    * hrefs, which point at the SOURCE host — derives from `cloneSource(i)`
    * so the front-page content sha1 matches and clone detection fires.
    * Relative links still resolve against the clone's own base URL, so
    * the clone's own sub-pages stay discoverable. Media refs are not part
    * of the content hash and keep the owning host.
    */
  def spansOf(i: Long, p: Int, nHosts: Long): Seq[Span] = {
    val src = cloneSource(i)
    val host = hostName(i)
    val srcHost = hostName(src)
    val np = pagesPerHost(src)
    val b = Seq.newBuilder[Span]
    var off = 0
    def text(t: String): Unit = { b += Span("text", t, null, off); off += 1 }
    def media(r: String): Unit = { b += Span("media", null, r, off); off += 1 }
    def header(t: String): Unit = { b += Span("header", t, null, off); off += 1 }

    // response headers first, like the wire: kind="header" keeps them out
    // of the body content hash (clone detection) and the FTS index
    val pb = poweredByOf(i)
    header(s"Server: ${serverOf(i)}" +
      (if (pb.nonEmpty) s"\nX-Powered-By: $pb" else ""))

    text(s"<title>${titleOf(i, p)}</title> ${fillerText(Hashing.mix(src * 7 + p), 8)}")

    // links: next page on same host, a relative link, cross-host links,
    // a duplicate variant (query order + fragment) of the next-page link.
    val sb = new StringBuilder
    val nxt = (p + 1) % np
    val rel = (p + 2) % np
    // unsorted query + fragment: canonicalizes onto the real doc URL
    if (nxt == 0) sb.append(s"""<a href="/">next</a> """)
    else sb.append(s"""<a href="/p$nxt?b=2&a=1">next</a> """)
    if (rel == 0) sb.append(s"""<a href="/#top">rel</a> """)
    else sb.append(s"""<a href="p$rel?b=2&a=1">rel</a> """)
    var s = 0
    while (s < 2) {
      val t = crossTarget(src, p, nHosts, s)
      sb.append(s"""<a href="http://${hostName(t)}/">x$s</a> """)
      s += 1
    }
    if (nxt != 0)
      sb.append(s"""<a href="http://$srcHost/p$nxt?a=1&b=2#frag">dup</a> """)
    if (p == 0) sb.append(s"""<a href="/private/area">members</a> """)
    text(sb.toString)

    media(s"http://$host/img/$p.png")

    // plain-text mentions: onion discovery (not an anchor), email, btc
    val mention = hostName(pick(Hashing.mix(src * 17 + p * 3), nHosts))
    text(s"find us also at $mention contact ${emailOf(i)} donate ${btcOf(src * 23 + p)} " +
      fillerText(Hashing.mix(src * 29 + p), 6))

    // infrastructure facts on the front page: ssh host key + open ports
    // (clone hosts share their source's — the A6 "matching SSH fp" rule)
    if (p == 0)
      text(s"ssh host key ${sshFpOf(i)} " +
        portsOf(i).map(pt => s"port $pt/tcp open").mkString(" "))

    // subdomain bomb (F6): one host's p1 links to > crapSubdomainLimit
    // subdomains of its own base
    if (i == BombHost && p == 1 && nHosts > BombHost)
      text((0 until BombSubdomains)
        .map(k => s"""<a href="http://sub$k.$host/">s$k</a>""").mkString(" "))
    b.result()
  }

  def docOf(i: Long, p: Int, nHosts: Long): Doc = Doc(urlOf(i, p), spansOf(i, p, nHosts))

  /** Distributed corpus generation for bench scale: one task per host
    * range, no driver materialization — the same pure functions, so a
    * distributed corpus equals `docsLocal` row-for-row.
    */
  def docsDF(spark: org.apache.spark.sql.SparkSession, nHosts: Long)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0, nHosts)
      .filter(i => !isGhost(i))
      .flatMap(i => (0 until pagesPerHost(i)).map(p => docOf(i, p, nHosts)))
      .toDF()
  }

  /** All documents, driver-side (small fixtures / property tests). */
  def docsLocal(nHosts: Int): Seq[Doc] =
    (0L until nHosts.toLong).filterNot(isGhost).flatMap { i =>
      (0 until pagesPerHost(i)).map(p => docOf(i, p, nHosts.toLong))
    }

  /** Robots rules: every 5th host denies /private with a crawl_delay
    * override; the hot domain gets a fast delay (big budget) so the skew
    * is visible in scheduling too.
    */
  def robotsLocal(nHosts: Int): Seq[RobotsRule] = {
    val denies = (0L until nHosts.toLong).filter(i => i % 5 == 0 && i != 0).flatMap { i =>
      Seq(
        RobotsRule(hostName(i), "/private", allow = false, crawl_delay = 15.0),
        RobotsRule(hostName(i), "/", allow = true, crawl_delay = 15.0))
    }
    val hot = Seq(RobotsRule(hostName(0), "/", allow = true, crawl_delay = 2.0))
    denies ++ hot
  }

  /** Death schedule for alive/dead-transition tests. */
  def hostDeathsLocal(nHosts: Int): Seq[(String, Int)] =
    (0L until nHosts.toLong).filter(i => deadFromRound(i) >= 0)
      .map(i => hostName(i) -> deadFromRound(i))

  /** Seed list (FIXTURES.md B2): front pages of the first k hosts, plus a
    * duplicate variant, a ghost (dead) host and a robots-denied URL.
    */
  def seedsLocal(nHosts: Int, k: Int): Seq[String] = {
    val base = (0L until math.min(k.toLong, nHosts.toLong)).map(i => urlOf(i, 0))
    // canonicalizes identically to urlOf(0,0): uppercase host + fragment
    val dupVariant = Seq(s"http://${hostName(0).toUpperCase}/#top")
    val ghost = (0L until nHosts.toLong).find(isGhost).map(i => urlOf(i, 0)).toSeq
    val denied = Seq(s"http://${hostName(5)}/private/area")
    base ++ dupVariant ++ ghost ++ denied
  }
}

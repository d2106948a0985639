package graft.extract

import graft.model.Span
import graft.url.Urls

/** One extracted anchor: absolute canonical URL + its 0-based position in
  * the parent document's span order. The position feeds `enqueue_seq`
  * (SURVEY.md §6.3) — so extraction MUST walk spans sorted by `offset`;
  * any reordering changes the golden crawl order.
  */
final case class ExtractedLink(dst_url: String, pos: Int)

final case class Parsed(
    url: String,
    host: String,
    title: String,
    content_sha1: String,
    links: Seq[ExtractedLink],
    media_refs: Seq[String],
    onions: Seq[String],
    emails: Seq[String],
    btcs: Seq[String],
    ssh_fps: Seq[String],
    ports: Seq[String],
    server: String,
    powered_by: String)

/** Pure per-document parser (SURVEY.md §3.10 U5) — regex + RFC 3986
  * resolution is genuinely imperative, so it runs as ONE typed flatMap
  * pass per fetched page; everything downstream is stock Catalyst.
  */
object SpanExtract {

  val HrefRxPub = """(?i)href\s*=\s*["']([^"'\s>]+)["']""".r
  val TitleRxPub = """(?is)<title[^>]*>(.*?)</title>""".r
  val OnionRx = """([a-z2-7]{16}|[a-z2-7]{56})\.onion""".r
  val EmailRx = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""".r
  val BtcRx = """\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b""".r
  /** SSH host-key fingerprint + open-port scan facts (the reference keeps
    * both per onion and correlates shared keys with content clones).
    */
  val SshFpRx = """SHA256:[A-Za-z0-9]{43}""".r
  val PortRx = """\b(\d{1,5})/tcp open""".r
  /** Response-header facts out of kind="header" spans (reference keeps
    * Server / X-Powered-By per domain). Header spans are excluded from
    * the body text, so they never perturb content hashes or the FTS body.
    */
  val ServerRx = """(?im)^server:\s*(\S[^\r\n]*)""".r
  val PoweredByRx = """(?im)^x-powered-by:\s*(\S[^\r\n]*)""".r

  // ---- anchored linear scanners -------------------------------------
  // java.util.regex find() restarts the backtracking engine at every
  // text position: for EmailRx that is O(text × run-length) with large
  // pointer-chasing constants — measured at >50% of the WHOLE document
  // parse, and the dominant executor CPU of a crawl round. Email and
  // onion matches are anchored by literal substrings ('@', ".onion"), so
  // an indexOf-driven scan that expands around each anchor produces the
  // EXACT regex match sequence (proof sketched inline; property-tested
  // against the regexes over adversarial random strings in
  // FastScanSpec) at a fraction of the cost.

  private def asciiSet(chars: String): Array[Boolean] = {
    val a = new Array[Boolean](128)
    chars.foreach(c => a(c) = true)
    a
  }
  private val Alnum =
    ('A' to 'Z').mkString + ('a' to 'z').mkString + ('0' to '9').mkString
  private val LocalChars = asciiSet(Alnum + "._%+-")   // EmailRx local part
  private val DomainChars = asciiSet(Alnum + ".-")     // EmailRx domain
  private val AlphaChars = asciiSet(Alnum.take(52))    // EmailRx tld
  private val OnionChars = asciiSet(('a' to 'z').mkString + "234567")

  @inline private def in(set: Array[Boolean], c: Char): Boolean =
    c < 128 && set(c)

  /** Exactly `EmailRx.findAllMatchIn(text).map(_.matched)`.
    *
    * Equivalence: `L+@D+\.A{2,}` can only match with the '@' adjacent to
    * a maximal L-run on its left ('@'∉L, so greedy L+ never ends
    * mid-run), and the domain is the D-run after '@' truncated at the
    * RIGHTMOST dot that is followed by ≥2 alphas (D+ backtracks from its
    * maximum, A{2,} is greedy; '.'∈D and A⊂D keep everything inside the
    * run). find()'s non-overlap rule = clamping the local-part back-scan
    * at the previous match end.
    */
  def fastEmails(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = text.length
    var prevEnd = 0
    var at = text.indexOf('@')
    while (at >= 0) {
      var matched = false
      if (at > prevEnd) {
        // maximal local-part run ending at '@', clamped at prevEnd
        var ls = at
        while (ls > prevEnd && in(LocalChars, text.charAt(ls - 1))) ls -= 1
        if (ls < at) {
          // maximal domain run after '@'
          var de = at + 1
          while (de < n && in(DomainChars, text.charAt(de))) de += 1
          // rightmost dot inside the run followed by >=2 alphas
          var j = de - 1
          var end = -1
          while (j > at + 1 && end < 0) {
            if (text.charAt(j) == '.') {
              var a = j + 1
              while (a < n && in(AlphaChars, text.charAt(a))) a += 1
              if (a - (j + 1) >= 2) end = a
            }
            j -= 1
          }
          if (end > 0) {
            out += text.substring(ls, end)
            prevEnd = end
            at = text.indexOf('@', end)
            matched = true
          }
        }
      }
      if (!matched) at = text.indexOf('@', at + 1)
    }
    out.result()
  }

  private val BtcChars = asciiSet("abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789")
  private val WordChars = asciiSet(Alnum + "_")
  private val AlnumChars = asciiSet(Alnum)
  private val DigitChars = asciiSet("0123456789")

  /** Exactly `BtcRx.findAllMatchIn(text).map(_.matched)` — i.e.
    * `\b[13][base58]{25,34}\b`.
    *
    * Equivalence: the base58 class is a subset of `\w` minus {0,O,I,l,_},
    * so the trailing `\b` can only hold where the WORD run ends — any
    * excluded word char (or more base58 chars past 34) immediately after
    * the matched span is a word-word boundary failure, and backtracking
    * `{25,34}` only moves the boundary deeper into the run. Hence a match
    * exists iff a maximal word-char run is exactly `[13]` followed by
    * 25..34 base58 chars. Runs are disjoint, so scanning maximal runs
    * left-to-right reproduces find()'s non-overlap.
    */
  def fastBtcs(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && !in(WordChars, text.charAt(i))) i += 1
      val start = i
      while (i < n && in(WordChars, text.charAt(i))) i += 1
      val len = i - start
      if (len >= 26 && len <= 35) {
        val c0 = text.charAt(start)
        if (c0 == '1' || c0 == '3') {
          var k = start + 1
          while (k < i && in(BtcChars, text.charAt(k))) k += 1
          if (k == i) out += text.substring(start, i)
        }
      }
    }
    out.result()
  }

  /** Exactly `SshFpRx.findAllMatchIn(text).map(_.matched)` — literal
    * `SHA256:` followed by exactly 43 `[A-Za-z0-9]`. No boundary
    * assertions, so each literal anchor either extends to a match (next
    * 43 chars all alnum) or does not; non-overlap = resuming after a
    * match's end.
    */
  def fastSshFps(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = text.length
    var at = text.indexOf("SHA256:")
    while (at >= 0) {
      val end = at + 7 + 43
      var k = at + 7
      while (k < math.min(end, n) && in(AlnumChars, text.charAt(k))) k += 1
      if (k == end) {
        out += text.substring(at, end)
        at = text.indexOf("SHA256:", end)
      } else at = text.indexOf("SHA256:", at + 1)
    }
    out.result()
  }

  /** Exactly `PortRx.findAllMatchIn(text).map(_.group(1))` — i.e. the
    * captured digits of `\b(\d{1,5})/tcp open`.
    *
    * Equivalence: greedy `\d{1,5}` anchored by the leading `\b` must
    * start at the digit run's beginning (any later start is digit-digit,
    * no boundary), and must consume the WHOLE run to reach `/` — so a
    * match exists iff the maximal digit run before a literal `/tcp open`
    * has length 1..5. Anchors scan left-to-right from the previous
    * match end.
    */
  def fastPorts(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var prevEnd = 0
    var slash = text.indexOf("/tcp open")
    while (slash >= 0) {
      var ds = slash
      while (ds > prevEnd && in(DigitChars, text.charAt(ds - 1))) ds -= 1
      val len = slash - ds
      val bounded = ds == 0 || !in(WordChars, text.charAt(ds - 1))
      if (len >= 1 && len <= 5 && bounded) {
        out += text.substring(ds, slash)
        prevEnd = slash + 9
        slash = text.indexOf("/tcp open", prevEnd)
      } else slash = text.indexOf("/tcp open", slash + 1)
    }
    out.result()
  }

  /** Exactly `OnionRx.findAllMatchIn(text).map(_.matched)`.
    *
    * Equivalence: a match is a 16- or 56-char [a-z2-7] run immediately
    * before literal ".onion". find() picks the LEFTMOST start, so a run
    * of ≥56 matches its 56-suffix (starts further left than the
    * 16-suffix), a run of 16..55 matches its 16-suffix, shorter runs
    * never match; scanning anchors left-to-right from the previous match
    * end reproduces non-overlap.
    */
  def fastOnions(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var prevEnd = 0
    var dot = text.indexOf(".onion")
    while (dot >= 0) {
      var rs = dot
      while (rs > prevEnd && in(OnionChars, text.charAt(rs - 1))) rs -= 1
      val run = dot - rs
      val take = if (run >= 56) 56 else if (run >= 16) 16 else 0
      if (take > 0) {
        out += text.substring(dot - take, dot + 6)
        prevEnd = dot + 6
        dot = text.indexOf(".onion", dot + 6)
      } else {
        dot = text.indexOf(".onion", dot + 1)
      }
    }
    out.result()
  }

  /** Span-order fidelity (SURVEY.md §9.5 #5): ALWAYS re-sort by offset —
    * never trust arrival order after a shuffle/explode.
    */
  def ordered(spans: Seq[Span]): Seq[Span] = spans.sortBy(_.offset)

  def parse(baseUrl: String, spans: Seq[Span]): Parsed = {
    val sorted = ordered(spans)
    val texts = sorted.collect { case s if s.kind == "text" && s.text != null => s.text }
    val media = sorted.collect { case s if s.kind == "media" && s.media_ref != null => s.media_ref }
    val headers = sorted.collect { case s if s.kind == "header" && s.text != null => s.text }
    val joined = texts.mkString("\n")
    val headerText = headers.mkString("\n")

    val title = TitleRxPub.findFirstMatchIn(joined)
      .map(m => m.group(1).trim.take(255)).getOrElse("")

    // anchors in span order; pos is global across the document
    val links = Seq.newBuilder[ExtractedLink]
    var pos = 0
    texts.foreach { t =>
      HrefRxPub.findAllMatchIn(t).foreach { m =>
        Urls.resolve(baseUrl, m.group(1)).foreach { abs =>
          if (Urls.isOnionHost(Urls.hostOf(abs))) {
            links += ExtractedLink(abs, pos)
            pos += 1
          }
        }
      }
    }

    val onions = distinctInOrder(fastOnions(joined).map(_.toLowerCase))
    val emails = distinctInOrder(fastEmails(joined))
    val btcs = distinctInOrder(fastBtcs(joined))
    val sshFps = distinctInOrder(fastSshFps(joined))
    val ports = distinctInOrder(fastPorts(joined))

    Parsed(
      url = baseUrl,
      host = Urls.hostOf(baseUrl),
      title = title,
      content_sha1 = Urls.sha1Hex(joined),
      links = links.result(),
      media_refs = media,
      onions = onions,
      emails = emails,
      btcs = btcs,
      ssh_fps = sshFps,
      ports = ports,
      server = ServerRx.findFirstMatchIn(headerText)
        .map(_.group(1).trim.take(255)).getOrElse(""),
      powered_by = PoweredByRx.findFirstMatchIn(headerText)
        .map(_.group(1).trim.take(255)).getOrElse(""))
  }

  private def distinctInOrder(xs: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    xs.foreach(seen += _)
    seen.toSeq
  }
}

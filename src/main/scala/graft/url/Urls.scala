package graft.url

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Pure URL utilities — the determinism contract of SURVEY.md §6 lives here.
  *
  * Semantics reconstructed from the reference's dependency stack (the
  * reference repo `dirtyfilthy/freshonions-torscraper` was unavailable at
  * survey time — see SURVEY.md §0):
  *   - canonicalization ≈ `w3lib.url.canonicalize_url` as used by Scrapy's
  *     `RFPDupeFilter`: lowercase scheme+host, strip fragment, sort query
  *     params by (key, value), normalize %-escapes, empty path -> "/".
  *   - fingerprint ≈ `scrapy.utils.request.request_fingerprint`:
  *     sha1 over the request method + canonical URL.
  *
  * Everything here is pure Scala (zero Spark deps) so it can be used both
  * from UDFs and from driver-side fixture generation, and property-tested
  * without a SparkSession.
  */
object Urls {

  private val DefaultPorts = Map("http" -> 80, "https" -> 443)

  /** v2 (16 chars) and v3 (56 chars) onion hosts, optional subdomains. */
  private val OnionHostRx =
    "^([a-z0-9-]+\\.)*([a-z2-7]{16}|[a-z2-7]{56})\\.onion$".r

  def isOnionHost(host: String): Boolean =
    host != null && OnionHostRx.matches(host.toLowerCase)

  /** Parse a URL into (scheme, host, port, path, query, fragment) leniently.
    * Returns None when there is no recognizable scheme+host.
    */
  private[url] def split(url: String): Option[(String, String, Int, String, String, String)] = {
    if (url == null) return None
    val trimmed = url.trim
    val schemeEnd = trimmed.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = trimmed.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    val rest = trimmed.substring(schemeEnd + 3)
    val (authorityAndPath, fragment) = rest.indexOf('#') match {
      case -1 => (rest, "")
      case i  => (rest.substring(0, i), rest.substring(i + 1))
    }
    val (authorityPath, query) = authorityAndPath.indexOf('?') match {
      case -1 => (authorityAndPath, "")
      case i  => (authorityAndPath.substring(0, i), authorityAndPath.substring(i + 1))
    }
    val (authority, path) = authorityPath.indexOf('/') match {
      case -1 => (authorityPath, "")
      case i  => (authorityPath.substring(0, i), authorityPath.substring(i))
    }
    // strip userinfo (rare; reference crawls plain onion HTTP)
    val hostPort = authority.lastIndexOf('@') match {
      case -1 => authority
      case i  => authority.substring(i + 1)
    }
    val (host, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, -1)
      case i =>
        // toIntOption + range check keeps canonicalize TOTAL: an all-digit
        // port beyond Int/65535 (http://x:99999999999/) must not throw —
        // fall back to treating the whole authority as the hostname
        val p = hostPort.substring(i + 1)
        p.toIntOption.filter(v => v >= 0 && v <= 65535) match {
          case Some(v) => (hostPort.substring(0, i), v)
          case None    => (hostPort, -1)
        }
    }
    if (host.isEmpty) None
    else Some((scheme, host.toLowerCase, port, path, query, fragment))
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** Normalize %-escapes: decode unreserved characters, uppercase the hex
    * digits of everything else, leave malformed escapes untouched.
    */
  private[url] def normalizeEscapes(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else { sb.append('%'); sb.append(s.substring(i + 1, i + 3).toUpperCase) }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Remove dot-segments per RFC 3986 §5.2.4. */
  private[url] def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "."  => // skip
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s    => out += s
      }
      i += 1
    }
    val joined = out.mkString("/")
    val endsWithDot = path.endsWith("/.") || path.endsWith("/..")
    val result = if (path.startsWith("/") && !joined.startsWith("/")) "/" + joined else joined
    if (endsWithDot && !result.endsWith("/")) result + "/" else result
  }

  /** Canonicalize a URL (the normative dedup key, SURVEY.md §6.1 R1).
    * Non-http(s)/unparseable inputs canonicalize to lowercase-trimmed self
    * so the function is total and idempotent.
    */
  def canonicalize(url: String): String = split(url) match {
    case None => if (url == null) "" else url.trim.toLowerCase
    case Some(parts) => canonicalizeParts(parts)
  }

  /** canonicalize() after a successful [[split]] — exposed so callers
    * that already split (resolve()'s validity check) don't re-split:
    * the double split profiled at ~20 GB/run of substring garbage in
    * the link-extraction hot loop.
    */
  private[url] def canonicalizeParts(
      parts: (String, String, Int, String, String, String)): String = {
    val (scheme, host, port, path0, query, _) = parts
    val portPart =
      if (port == -1 || DefaultPorts.get(scheme).contains(port)) ""
      else ":" + port
    val path = {
      val p = removeDotSegments(normalizeEscapes(path0))
      if (p.isEmpty) "/" else p
    }
    val queryPart =
      if (query.isEmpty) ""
      else {
        val pairs = query.split("&", -1).filter(_.nonEmpty).map { kv =>
          kv.indexOf('=') match {
            case -1 => (normalizeEscapes(kv), None)
            case i  => (normalizeEscapes(kv.substring(0, i)), Some(normalizeEscapes(kv.substring(i + 1))))
          }
        }
        val sorted = pairs.sortBy { case (k, v) => (k, v.getOrElse("")) }
        if (sorted.isEmpty) ""
        else "?" + sorted.map { case (k, Some(v)) => s"$k=$v"; case (k, None) => k }.mkString("&")
      }
    s"$scheme://$host$portPart$path$queryPart"
  }

  /** Request fingerprint (SURVEY.md §6.1 R2): sha1 hex of "GET <canon>". */
  def fingerprint(url: String): String =
    sha1Hex("GET " + canonicalize(url))

  // MessageDigest.getInstance takes a java.security.Provider lock — at 32
  // executor threads a per-row getInstance serializes the whole stage
  // (measured: 4-7x slowdown at local[32] vs local[4]). One digest per
  // thread, reset per use.
  private val sha1Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-1")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def sha1Hex(s: String): String = {
    val md = sha1Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](40)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** RFC 3986 resolution of href against base (SURVEY.md §3.7 R3), with
    * onion-crawl guards: only http(s) results, host must survive parsing.
    *
    * The two dominant anchor shapes — absolute-path (`/p1`) and simple
    * relative (`p2?a=1`) — resolve with plain string work; `java.net.URI`
    * (multi-KB of parser allocation per call, profiled in the extraction
    * hot loop) handles everything else and REMAINS the executable spec:
    * UrlsSpec property-checks the fast path against it on adversarial
    * (base, href) pairs, and the frozen goldens pin the integration.
    */
  def resolve(base: String, href: String): Option[String] = {
    if (href == null || base == null) return None
    val h = href.trim
    if (h.isEmpty || h.startsWith("#") || h.startsWith("javascript:") ||
        h.startsWith("mailto:") || h.startsWith("data:")) return None
    try {
      val resolved =
        if (h.contains("://")) h
        else resolveFast(base, h).getOrElse(
          new java.net.URI(base).resolve(escapeForUri(h)).toString)
      split(resolved).map(canonicalizeParts)
    } catch { case _: Exception => None }
  }

  /** Fast-path RFC 3986 merge for guarded shapes; None = use URI. Shapes:
    *   - absolute-path refs `/x...` (not protocol-relative `//`),
    *   - relative refs with no scheme/colon-ambiguity, no dot segments,
    *     no query-only/fragment forms.
    * Both append to `scheme://authority`; relative refs merge onto the
    * base path's directory (base query dropped, per §5.3). Fragments pass
    * through — the caller canonicalizes them away, like the URI path.
    */
  /** chars that pass through the URI path unescaped AND unrejected —
    * anything else (space, quotes, brackets, braces, control, non-ASCII)
    * falls back so fast-path and URI-path outputs cannot diverge.
    */
  private def plainRefChar(c: Char): Boolean =
    isUnreserved(c) || c == '/' || c == '?' || c == '#' || c == '%' ||
      c == '&' || c == '=' || c == '+' || c == ',' || c == ';' ||
      c == '!' || c == '$' || c == '\'' || c == '(' || c == ')' ||
      c == '*' || c == '@' || c == ':'

  private def resolveFast(base: String, h: String): Option[String] = {
    var k = 0
    while (k < h.length) {
      val c = h.charAt(k)
      if (!plainRefChar(c)) return None
      // java.net.URI rejects malformed percent-escapes ("50%off", "%zz",
      // trailing "a%2") with IAE — the caller then drops the link. A bare
      // '%' accepted here would make the fast path KEEP what the spec path
      // drops, so require %HH or fall back.
      if (c == '%') {
        if (k + 2 >= h.length || !isHex(h.charAt(k + 1)) || !isHex(h.charAt(k + 2)))
          return None
      }
      k += 1
    }
    val schemeEnd = base.indexOf("://")
    if (schemeEnd <= 0) return None
    val authStart = schemeEnd + 3
    val authEnd0 = base.indexWhere(c => c == '/' || c == '?' || c == '#', authStart)
    val authEnd = if (authEnd0 == -1) base.length else authEnd0
    if (authEnd == authStart) return None // empty authority: let URI decide
    val root = base.substring(0, authEnd)
    if (hasDotSegment(h)) return None

    if (h.startsWith("/")) {
      if (h.startsWith("//")) None // protocol-relative
      else Some(root + h)
    } else {
      // simple relative: no ':' before the first '/', '?' or '#' (scheme
      // ambiguity), not query-only
      var i = 0
      var colon = false
      while (i < h.length && h.charAt(i) != '/' && h.charAt(i) != '?' && h.charAt(i) != '#') {
        if (h.charAt(i) == ':') colon = true
        i += 1
      }
      if (colon || h.startsWith("?")) None
      else {
        // merge onto the base path's directory (§5.3: strip query, keep
        // path up to the last '/'; empty base path merges as "/"); a base
        // path with its own dot segments falls back (URI normalizes at
        // merge time, the fast path would defer to canonicalize — equal
        // in the end, but let the spec path handle the exotic case)
        val pathEnd0 = base.indexWhere(c => c == '?' || c == '#', authEnd)
        val pathEnd = if (pathEnd0 == -1) base.length else pathEnd0
        val basePath = base.substring(authEnd, pathEnd)
        if (hasDotSegment(basePath)) None
        else {
          val dir = basePath.lastIndexOf('/') match {
            case -1 => "/"
            case j  => basePath.substring(0, j + 1)
          }
          Some(root + dir + h)
        }
      }
    }
  }

  /** "." or ".." as a complete path segment anywhere in the ref. */
  private def hasDotSegment(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i) != '?' && s.charAt(i) != '#') {
      if (s.charAt(i) == '.' &&
          (i == 0 || s.charAt(i - 1) == '/')) {
        var j = i
        while (j < n && s.charAt(j) == '.') j += 1
        if (j - i <= 2 && (j == n || s.charAt(j) == '/' || s.charAt(j) == '?' || s.charAt(j) == '#'))
          return true
      }
      i += 1
    }
    false
  }

  /** java.net.URI rejects raw spaces etc.; escape minimally. */
  private def escapeForUri(s: String): String =
    s.replace(" ", "%20").replace("\"", "%22").replace("<", "%3C")
      .replace(">", "%3E").replace("|", "%7C").replace("`", "%60")
      .replace("\\", "%5C").replace("^", "%5E").replace("{", "%7B")
      .replace("}", "%7D")

  def hostOf(url: String): String = split(url).map(_._2).getOrElse("")

  def pathOf(url: String): String =
    split(url).map { case (_, _, _, p, _, _) => if (p.isEmpty) "/" else p }.getOrElse("/")
}

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
    ports: Seq[String])

/** Pure per-document parser (SURVEY.md §3.10 U5) — regex + RFC 3986
  * resolution is genuinely imperative, so it runs as ONE typed flatMap
  * pass per fetched page; everything downstream is stock Catalyst.
  */
object SpanExtract {

  private val HrefRx = """(?i)href\s*=\s*["']([^"'\s>]+)["']""".r
  private val TitleRx = """(?is)<title[^>]*>(.*?)</title>""".r
  val OnionRx = """([a-z2-7]{16}|[a-z2-7]{56})\.onion""".r
  val EmailRx = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""".r
  val BtcRx = """\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b""".r
  /** SSH host-key fingerprint + open-port scan facts (the reference keeps
    * both per onion and correlates shared keys with content clones).
    */
  val SshFpRx = """SHA256:[A-Za-z0-9]{43}""".r
  val PortRx = """\b(\d{1,5})/tcp open""".r

  /** Span-order fidelity (SURVEY.md §9.5 #5): ALWAYS re-sort by offset —
    * never trust arrival order after a shuffle/explode.
    */
  def ordered(spans: Seq[Span]): Seq[Span] = spans.sortBy(_.offset)

  def parse(baseUrl: String, spans: Seq[Span]): Parsed = {
    val sorted = ordered(spans)
    val texts = sorted.collect { case s if s.kind == "text" && s.text != null => s.text }
    val media = sorted.collect { case s if s.kind == "media" && s.media_ref != null => s.media_ref }
    val joined = texts.mkString("\n")

    val title = TitleRx.findFirstMatchIn(joined)
      .map(m => m.group(1).trim.take(255)).getOrElse("")

    // anchors in span order; pos is global across the document
    val links = Seq.newBuilder[ExtractedLink]
    var pos = 0
    texts.foreach { t =>
      HrefRx.findAllMatchIn(t).foreach { m =>
        Urls.resolve(baseUrl, m.group(1)).foreach { abs =>
          if (Urls.isOnionHost(Urls.hostOf(abs))) {
            links += ExtractedLink(abs, pos)
            pos += 1
          }
        }
      }
    }

    val onions = distinctInOrder(
      OnionRx.findAllMatchIn(joined).map(m => m.matched.toLowerCase).toSeq)
    val emails = distinctInOrder(EmailRx.findAllMatchIn(joined).map(_.matched).toSeq)
    val btcs = distinctInOrder(BtcRx.findAllMatchIn(joined).map(_.matched).toSeq)
    val sshFps = distinctInOrder(SshFpRx.findAllMatchIn(joined).map(_.matched).toSeq)
    val ports = distinctInOrder(PortRx.findAllMatchIn(joined).map(_.group(1)).toSeq)

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
      ports = ports)
  }

  private def distinctInOrder(xs: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    xs.foreach(seen += _)
    seen.toSeq
  }
}

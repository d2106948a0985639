package graft.extract

import graft.model.Span
import org.scalatest.funsuite.AnyFunSuite

class SpanExtractSpec extends AnyFunSuite {

  val base = "http://abcdefghij234567.onion/"

  val spans = Seq(
    Span("text", "<title>My Hidden Service</title> welcome", null, 0),
    Span("text", """<a href="/p1">one</a> <a href="p2?b=2&a=1">two</a>""", null, 1),
    Span("media", null, s"${base}img/x.png", 2),
    Span("text", "mirror at zyxwvutsrq765432.onion mail admin@mail1.onion " +
      "btc 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2", null, 3))

  test("title, links (span order + positions), onions, emails, btc, sha1") {
    val p = SpanExtract.parse(base, spans)
    assert(p.title == "My Hidden Service")
    assert(p.links == Seq(
      ExtractedLink("http://abcdefghij234567.onion/p1", 0),
      ExtractedLink("http://abcdefghij234567.onion/p2?a=1&b=2", 1)))
    assert(p.onions == Seq("zyxwvutsrq765432.onion"))
    assert(p.emails == Seq("admin@mail1.onion"))
    assert(p.btcs == Seq("1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2"))
    assert(p.media_refs == Seq(s"${base}img/x.png"))
    assert(p.content_sha1.matches("[0-9a-f]{40}"))
  }

  test("span-order fidelity: shuffled spans parse identically (re-sorted by offset)") {
    val shuffled = Seq(spans(3), spans(1), spans(0), spans(2))
    assert(SpanExtract.parse(base, shuffled) == SpanExtract.parse(base, spans))
  }

  test("non-onion links dropped, clearnet hosts never enqueue") {
    val s = Seq(Span("text", """<a href="http://example.com/x">c</a>""", null, 0))
    assert(SpanExtract.parse(base, s).links.isEmpty)
  }
}

package graft.extract

import graft.fixtures.SyntheticCorpus
import org.scalatest.funsuite.AnyFunSuite

/** The anchored linear scanners must reproduce the regex match sequences
  * EXACTLY — the regexes stay in the code as the executable spec, the
  * scanners are the hot path. Adversarial random strings are drawn from
  * an alphabet dense in anchor/class characters so boundary cases
  * (clamped back-scans, dotless domains, short tlds, 16/56 run edges,
  * overlap suppression) occur constantly.
  */
class FastScanSpec extends AnyFunSuite {

  private def emailsRx(t: String) = SpanExtract.EmailRx.findAllMatchIn(t).map(_.matched).toSeq
  private def onionsRx(t: String) = SpanExtract.OnionRx.findAllMatchIn(t).map(_.matched).toSeq

  test("fastEmails equals EmailRx on 20k adversarial random strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab1.@-_%+ @.@."
    for (i <- 0 until 20000) {
      val len = 1 + rnd.nextInt(60)
      val t = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(SpanExtract.fastEmails(t) == emailsRx(t), s"case $i: <$t>")
    }
  }

  test("fastEmails equals EmailRx on realistic strings") {
    val cases = Seq(
      "contact admin1@mail2.onion donate", "a@b.c", "a@b.co", "a@b.co7x",
      "aa@bb.cc@dd.ee", "a@b@c.com", "x@y z1@z2.com", "@x.com a@", "",
      "a.b.c@d.e.fg hij", "a@x.yy.zz tail", "user@[1.2.3.4]", "a@-.-.ab")
    cases.foreach(t => assert(SpanExtract.fastEmails(t) == emailsRx(t), s"<$t>"))
  }

  test("fastOnions equals OnionRx on 20k adversarial random strings") {
    val rnd = new scala.util.Random(7)
    // strings with frequent .onion anchors and runs straddling 16/56
    def run(n: Int) = (0 until n).map(_ => "abcdefghijklmnopqrstuvwxyz234567"(rnd.nextInt(32))).mkString
    for (i <- 0 until 20000) {
      val parts = (0 until 1 + rnd.nextInt(4)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => run(rnd.nextInt(20)) + ".onion"
          case 1 => run(50 + rnd.nextInt(12)) + ".onion"
          case 2 => run(16) + ".onion" + run(16) + ".onion"
          case 3 => "http://" + run(16).toUpperCase + ".ONION/"
          case _ => run(rnd.nextInt(70))
        }
      }
      val t = parts.mkString(rnd.nextInt(3) match {
        case 0 => " "; case 1 => ""; case _ => "."
      })
      assert(SpanExtract.fastOnions(t) == onionsRx(t), s"case $i: <$t>")
    }
  }

  test("scanners equal regexes over every fixture document text") {
    val docs = (0L until 200L).filterNot(SyntheticCorpus.isGhost).flatMap { i =>
      (0 until SyntheticCorpus.pagesPerHost(i)).map(p => SyntheticCorpus.docOf(i, p, 200L))
    }
    docs.foreach { d =>
      val t = d.spans.filter(s => s.kind == "text" && s.text != null)
        .sortBy(_.offset).map(_.text).mkString("\n")
      assert(SpanExtract.fastEmails(t) == emailsRx(t), d.doc_id)
      assert(SpanExtract.fastOnions(t) == onionsRx(t), d.doc_id)
    }
  }
}

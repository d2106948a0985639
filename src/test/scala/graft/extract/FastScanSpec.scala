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

  private def btcsRx(t: String) = SpanExtract.BtcRx.findAllMatchIn(t).map(_.matched).toSeq
  private def sshRx(t: String) = SpanExtract.SshFpRx.findAllMatchIn(t).map(_.matched).toSeq
  private def portsRx(t: String) = SpanExtract.PortRx.findAllMatchIn(t).map(_.group(1)).toSeq

  test("fastBtcs equals BtcRx on 20k adversarial random strings") {
    val rnd = new scala.util.Random(13)
    val b58 = "abcdefghijkmnopqrstuvwxyzABCDEFGHJKLMNPQRSTUVWXYZ123456789"
    def run(n: Int) = (0 until n).map(_ => b58(rnd.nextInt(b58.length))).mkString
    for (i <- 0 until 20000) {
      val parts = (0 until 1 + rnd.nextInt(3)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => "1" + run(24 + rnd.nextInt(4))   // straddles the 25 floor
          case 1 => "3" + run(33 + rnd.nextInt(4))   // straddles the 34 cap
          case 2 => "1" + run(20) + "0" + run(10)    // excluded word char splits the run
          case 3 => "x1" + run(30)                   // leading boundary failure
          case 4 => run(rnd.nextInt(40))
          case _ => "1" + run(30) + "_"              // trailing word char
        }
      }
      val t = parts.mkString(rnd.nextInt(3) match { case 0 => " "; case 1 => "."; case _ => "" })
      assert(SpanExtract.fastBtcs(t) == btcsRx(t), s"case $i: <$t>")
    }
  }

  test("fastSshFps / fastPorts equal their regexes on adversarial strings") {
    val rnd = new scala.util.Random(17)
    val alnum = "ABCdef012"
    def run(n: Int) = (0 until n).map(_ => alnum(rnd.nextInt(alnum.length))).mkString
    for (i <- 0 until 20000) {
      val t = (0 until 1 + rnd.nextInt(3)).map { _ =>
        rnd.nextInt(6) match {
          case 0 => "SHA256:" + run(42 + rnd.nextInt(3))
          case 1 => "SHA256:SHA256:" + run(43)
          case 2 => rnd.nextInt(999999).toString + "/tcp open"
          case 3 => "x" + rnd.nextInt(99) + "/tcp open"
          case 4 => run(rnd.nextInt(10)) + "/tcp ope"
          case _ => "port " + rnd.nextInt(65536) + "/tcp open more"
        }
      }.mkString(rnd.nextInt(2) match { case 0 => " "; case _ => "" })
      assert(SpanExtract.fastSshFps(t) == sshRx(t), s"ssh case $i: <$t>")
      assert(SpanExtract.fastPorts(t) == portsRx(t), s"port case $i: <$t>")
    }
  }

  test("btc/ssh/port scanners equal regexes over fixture document texts") {
    (0L until 100L).filterNot(SyntheticCorpus.isGhost).foreach { i =>
      (0 until SyntheticCorpus.pagesPerHost(i)).foreach { p =>
        val t = SyntheticCorpus.spansOf(i, p, 100L)
          .filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n")
        assert(SpanExtract.fastBtcs(t) == btcsRx(t), s"btc doc $i/$p")
        assert(SpanExtract.fastSshFps(t) == sshRx(t), s"ssh doc $i/$p")
        assert(SpanExtract.fastPorts(t) == portsRx(t), s"port doc $i/$p")
      }
    }
  }

  // ---- FastTerms (FTS tokenizer) vs its regex definition ----

  private def termsRx(t: String): Seq[String] = {
    // the defining semantics: array_distinct(filter(split(lower(t), "\W+"), len > 1))
    // with Spark's locale-independent lower
    val lowered = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      .toLowerCase.toString
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    lowered.split("\\W+").foreach(x => if (x.length > 1) seen += x)
    seen.toSeq
  }

  private def termsFast(t: String): Seq[String] = {
    val arr = graft.functions.TextOps.fastTerms(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("fastTerms equals the regex tokenizer on 20k adversarial random strings") {
    val rnd = new scala.util.Random(99)
    val alphabet = "aA1_ .!z9 _Z\tqQ-"
    for (i <- 0 until 20000) {
      val len = rnd.nextInt(60)
      val t = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(termsFast(t) == termsRx(t), s"case $i: <$t>")
    }
  }

  test("fastTerms non-ASCII fallback equals the regex tokenizer") {
    val cases = Seq("héllo wörld", "İstanbul CITY", "naïve mix_ed42 ascii",
      "汉字 and ascii_words", "ümlaut-ÜMLAUT", "aéb cd")
    cases.foreach(t => assert(termsFast(t) == termsRx(t), s"<$t>"))
  }

  test("fastTerms equals the regex tokenizer over fixture document texts") {
    (0L until 60L).filterNot(SyntheticCorpus.isGhost).foreach { i =>
      (0 until SyntheticCorpus.pagesPerHost(i)).foreach { p =>
        val t = SyntheticCorpus.spansOf(i, p, 60L)
          .filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n")
        assert(termsFast(t) == termsRx(t), s"doc $i/$p")
      }
    }
  }
}

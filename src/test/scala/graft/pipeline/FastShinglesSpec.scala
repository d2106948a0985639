package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FastShingles (the fused byte-scan) must reproduce the Catalyst
  * tokens→shingles composition EXACTLY — the composition stays in
  * `Dedup.shingles`/`Dedup.tokens` as the executable spec, the scan is
  * the hot path (the composition's higher-order functions are
  * interpreted; BENCH/BASELINE.md round-6). Alphabet dense in
  * separators, underscores, case flips and non-ASCII (é, the Kelvin
  * sign, an emoji) so the ASCII gate and the fallback both get hit; the
  * ordered array equality also pins array_distinct's first-occurrence
  * order and the below-k whole-join branch (including empty text).
  */
class FastShinglesSpec extends AnyFunSuite {

  implicit val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def check(cases: Seq[String], k: Int): Unit = {
    val df = cases.toDF("text")
    val got = df.select(Dedup.shingleSet(col("text"), k)).as[Seq[String]].collect().toSeq
    val want = df.select(Dedup.shingles(Dedup.tokens(col("text")), k))
      .as[Seq[String]].collect().toSeq
    got.lazyZip(want).lazyZip(cases).foreach { (g, w, c) =>
      assert(g == w, s"k=$k text=<$c>")
    }
  }

  test("fastShingles equals the composition on adversarial strings, k in 1..5") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 3000).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "...", "one", "one two", "one two three",
      "a a a a a", "x_1 x_1 x_1 y", "é K upper TEST lower",
      "AAA bbb AAA bbb AAA", "0 1 2 3 4 5 6 7 8 9")
    for (k <- Seq(1, 2, 3, 5)) check(random ++ edges, k)
  }

  test("fastTokens equals the composition on adversarial strings") {
    val rnd = new scala.util.Random(11)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 3000).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "...", "one", "one two", "a a a a a",
      "x_1 x_1 y", "é K upper TEST lower", "İstanbul K-9")
    val cases = random ++ edges
    val df = cases.toDF("text")
    val got = df.select(Dedup.tokenSeq(col("text"))).as[Seq[String]].collect().toSeq
    val want = df.select(Dedup.tokens(col("text"))).as[Seq[String]].collect().toSeq
    got.lazyZip(want).lazyZip(cases).foreach { (g, w, c) =>
      assert(g == w, s"text=<$c>")
    }
  }

  test("fastTokens equals the composition on every fixture document text") {
    import graft.fixtures.SyntheticCorpus
    val texts = SyntheticCorpus.docsLocal(40).map(d =>
      d.spans.filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n"))
    val df = texts.toDF("text")
    val got = df.select(Dedup.tokenSeq(col("text"))).as[Seq[String]].collect().toSeq
    val want = df.select(Dedup.tokens(col("text"))).as[Seq[String]].collect().toSeq
    got.lazyZip(want).foreach { (g, w) => assert(g == w) }
  }

  test("fastShingles equals the composition on every fixture document text") {
    import graft.fixtures.SyntheticCorpus
    val texts = SyntheticCorpus.docsLocal(40).map(d =>
      d.spans.filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n"))
    check(texts, 3)
  }

  /** the fused SimHash64 expression vs the exploded-votes composition,
    * ROW SET included: the composition's explode drops no-token docs,
    * the fused path drops them via null — the joined comparison must
    * cover every id from both sides.
    */
  private def checkSimhash(cases: Seq[String]): Unit = {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.simhash(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val want = Dedup.simhashComposed(df, "doc_id", "text",
        graft.pipeline.HashFamily.XxHash64)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == want.keySet,
      s"row sets differ: only-fused=${(got.keySet -- want.keySet).take(5)} " +
        s"only-composed=${(want.keySet -- got.keySet).take(5)}")
    got.foreach { case (id, h) =>
      assert(h == want(id), s"doc_id=$id text=<${cases(id.toInt)}>")
    }
  }

  test("fused SimHash64 equals the exploded-votes composition on adversarial strings") {
    val rnd = new scala.util.Random(13)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 3000).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "...", "\t\n", "one", "one two", "a a a a a",
      "x_1 x_1 y", "é K upper TEST lower", "İstanbul K-9", "🙂🙂", "é",
      ("tok " * 200).trim)
    checkSimhash(random ++ edges)
  }

  test("fused SimHash64 equals the composition on every fixture document text") {
    import graft.fixtures.SyntheticCorpus
    val texts = SyntheticCorpus.docsLocal(40).map(d =>
      d.spans.filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n"))
    checkSimhash(texts)
  }

  /** the fused MinHashSigs expression vs the exploded-mins composition:
    * full signature arrays, value for value (this also pins the fused
    * kernel's skip-the-distinct-set shortcut — a min over the shingle
    * multiset equals the min over the set).
    */
  private def checkMinhash(cases: Seq[String], k: Int, n: Int): Unit = {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Dedup.minhashSignatures(df, "doc_id", "text", k, n)
      .as[(Long, Seq[Long])].collect().toMap
    val want = Dedup.minhashSignaturesComposed(df, "doc_id", "text", k, n,
        graft.pipeline.HashFamily.XxHash64)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, sig) =>
      assert(sig == want(id), s"k=$k n=$n doc_id=$id text=<${cases(id.toInt)}>")
    }
  }

  test("fused MinHashSigs equals the exploded-mins composition on adversarial strings") {
    val rnd = new scala.util.Random(17)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 2000).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "...", "one", "one two", "one two three",
      "a a a a a", "x_1 x_1 x_1 y", "é K upper TEST lower",
      "AAA bbb AAA bbb AAA", ("tok " * 200).trim)
    for ((k, n) <- Seq((3, 64), (1, 8), (5, 16))) checkMinhash(random ++ edges, k, n)
  }

  test("fused MinHashSigs equals the composition on every fixture document text") {
    import graft.fixtures.SyntheticCorpus
    val texts = SyntheticCorpus.docsLocal(40).map(d =>
      d.spans.filter(s => s.kind == "text" && s.text != null).map(_.text).mkString("\n"))
    checkMinhash(texts, 3, 64)
  }

  /** the fused LshBandHashes expression vs the interpreted per-band
    * composition — band-hash VALUES must be identical (committed
    * dd_bands layouts depend on it). Signatures include the decimal
    * edge cases the kernel's manual long→ASCII must match
    * (0, ±1, Long.MinValue/MaxValue) and a ragged tail (signature
    * shorter than bands·r, where slice shortens / empties).
    */
  test("fused LshBandHashes equals the per-band composition, values and rows") {
    val rnd = new scala.util.Random(23)
    val edges = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, 10L, -10L,
      999999999999L, -100000000000L)
    val sigs: Seq[Seq[Long]] =
      (0 until 300).map(_ => Seq.fill(64)(rnd.nextLong())) ++
        Seq(Seq.fill(64)(0L), edges ++ Seq.fill(55)(rnd.nextLong()),
          Seq.fill(10)(rnd.nextLong()), // ragged: 10 < 16*4
          edges.take(3))                // very ragged: most bands empty
    for ((bands, r) <- Seq((16, 4), (8, 8), (4, 3))) {
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "minhash")
      val got = Dedup.lshBands(df, "doc_id", bands, r)
        .as[(Long, Int, Long)].collect().toSet
      val want = Dedup.lshBandsComposed(df, "doc_id", bands, r,
          graft.pipeline.HashFamily.XxHash64)
        .as[(Long, Int, Long)].collect().toSet
      assert(got == want, s"bands=$bands r=$r")
    }
  }

  /** the fused WinnowFp expression vs the interpreted window-minima
    * composition — fingerprint arrays AND fp digests, value for value.
    * Cases cover whitespace variety (the \s set), case preservation,
    * non-ASCII tokens (no fallback — byte-safe split), docs shorter than
    * the window, empty docs, and repeated tokens (distinct collapse).
    */
  test("fused WinnowFp equals the window-minima composition") {
    val rnd = new scala.util.Random(29)
    val alphabet = "ab AB_12 .,;|-éK🙂\n\t% "
    val random = (0 until 2000).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val edges = Seq("", " ", "\t\n\f\r", "one", "one two three",
      "a a a a a a a a", "Mixed CASE Mixed case", "é 🙂 K İ",
      "x\ty\nz", ("tok " * 300).trim, "  leading and trailing  ")
    val cases = random ++ edges
    for (w <- Seq(1, 4, 7)) {
      val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.winnowingFingerprint(df, "doc_id", "text", w)
        .as[(Long, Seq[Long], Long)].collect().toMap2
      val want = TextAnalysis.winnowingFingerprintComposed(df, "doc_id", "text", w,
          graft.pipeline.HashFamily.XxHash64)
        .as[(Long, Seq[Long], Long)].collect().toMap2
      assert(got.keySet == want.keySet, s"w=$w")
      got.foreach { case (id, v) =>
        assert(v == want(id), s"w=$w doc_id=$id text=<${cases(id.toInt)}>")
      }
    }
  }

  implicit private class Tuple3Map[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  /** the fused exact-Jaccard verify (sorted shingle sets + linear merge
    * intersect) vs the defining set-algebra composition — every output
    * column, row for row. Cases cover zero-overlap pairs (i=0, the
    * composition's left-join+coalesce branch), identical docs, non-ASCII
    * fallback docs, empty docs (the [""] single-shingle branch), pairs
    * referencing ids absent from docs (both shapes drop them), and docs
    * in multiple pairs.
    */
  test("fused exactJaccard equals the set-algebra composition") {
    val rnd = new scala.util.Random(43)
    val vocab = Vector("alpha", "beta", "Gamma", "delta_1", "é", "zz")
    val docs = (0L until 60L).map { id =>
      val n = rnd.nextInt(30)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ (60L, "") :+ (61L, "alpha beta Gamma") :+ (62L, "alpha beta Gamma") :+
      (63L, null.asInstanceOf[String]) // round-7 advice fix: both shapes drop the pair
    val docsDf = docs.toDF("doc_id", "text")
    val pairs = (0 until 120).map { _ =>
      val a = rnd.nextInt(63).toLong; val b = rnd.nextInt(63).toLong
      (math.min(a, b), math.max(a, b) + (if (a == b) 1 else 0))
    }.distinct ++ Seq((61L, 62L), (60L, 61L), (5L, 999L), (5L, 63L)) // identical, empty-vs-text, dangling id, null-text
    val pairsDf = pairs.toDF("id_a", "id_b")
    for (k <- Seq(1, 3)) {
      val got = Dedup.exactJaccard(docsDf, pairsDf, "doc_id", "text", k)
        .as[(Long, Long, Long, Long, Long, Double)].collect().sorted.toSeq
      val want = Dedup.exactJaccardComposed(docsDf, pairsDf, "doc_id", "text", k)
        .as[(Long, Long, Long, Long, Long, Double)].collect().sorted.toSeq
      assert(got == want, s"k=$k")
      assert(got.exists(_._3 == 0L), s"k=$k: no zero-overlap pair exercised")
    }
  }
}

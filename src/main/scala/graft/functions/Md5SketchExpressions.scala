package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the ORACLE (Md5) hash family — the same structural
  * move round 6 made for the production xxhash64 family (MinHashSigs /
  * LshBandHashes / SimHash64), applied to the Md5 parameterization the
  * DuckDB-twinned queries run. The Md5 family's composed pipelines were
  * the slowest headline entries left (dd03-Md5 ≈ 3 s vs 0.68 s for the
  * SAME plan under the fused xx64 stages at sf0.1): the cost is one
  * interpreted explode/aggregate structure PLUS a per-value
  * `md5(hex-string) → substring → conv(16,10)` chain that allocates a
  * 32-char hex string and parses it back per hash.
  *
  * Value contract (`HashFamily.Md5`, pinned by Md5FusedSpec and the
  * dd02/dd03/dd04/dd10/dd11 DuckDB oracles): one MD5 digest per value;
  * h1 = digest bytes 0–5 big-endian (= `conv(substring(hex, 1, 12), 16,
  * 10)`), h2 = bytes 6–11 (= hex chars 13–24); equality hash
  * `h1 + seed·h2` (< 2^55, no overflow); rank hash
  * `(h1 + seed·h2) mod (2^31 − 1)`. The kernels below compute the h1/h2
  * halves straight from the digest bytes — no hex string, no substring,
  * no string→long parse — and fold the seeds in registers.
  */
object Md5Ops {

  val RankModulus = 2147483647L // 2^31 - 1 (HashFamily.Md5.RankModulus)

  // one MD5 instance per thread (UrlExpressions.sha1Local precedent)
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** digest bytes[0, len) and return (h1, h2) packed — h1 in the HIGH
    * 48-bit sense is returned via the two-element scratch `out`.
    */
  private def h1h2(bytes: Array[Byte], len: Int, out: Array[Long]): Unit = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, 0, len)
    val d = md.digest()
    out(0) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    out(1) = ((d(6) & 0xffL) << 40) | ((d(7) & 0xffL) << 32) |
      ((d(8) & 0xffL) << 24) | ((d(9) & 0xffL) << 16) |
      ((d(10) & 0xffL) << 8) | (d(11) & 0xffL)
  }

  /** fold the numHashes rank-hash minima of one value's (h1, h2):
    * rank_j = (h1 + j·h2) mod (2^31 − 1) — operands non-negative, so
    * Java `%` equals `pmod`.
    */
  private def foldMins(mins: Array[Long], h1: Long, h2: Long): Unit = {
    var j = 0
    var acc = h1
    while (j < mins.length) {
      val v = acc % RankModulus
      if (v < mins(j)) mins(j) = v
      acc += h2
      j += 1
    }
  }

  /** static codegen target; see [[Md5MinHashSigs]]. */
  def minhashSigs(s: UTF8String, k: Int, n: Int): ArrayData = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return slowSigs(s, k, n); i += 1 }

    val toks = ShingleOps.tokenizeAscii(bytes)
    val mins = Array.fill(n)(Long.MaxValue)
    var buf = new Array[Byte](64)
    val hh = new Array[Long](2)

    def window(from: Int, until: Int): Unit = {
      var len = 0
      var t = from
      while (t < until) { len += toks(t).length; t += 1 }
      if (until > from) len += until - from - 1
      if (len > buf.length) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      t = from
      while (t < until) {
        if (t > from) { buf(pos) = ' '; pos += 1 }
        System.arraycopy(toks(t), 0, buf, pos, toks(t).length)
        pos += toks(t).length
        t += 1
      }
      h1h2(buf, len, hh)
      foldMins(mins, hh(0), hh(1))
    }

    if (toks.length < k) window(0, toks.length)
    else {
      var w = 0
      while (w <= toks.length - k) { window(w, w + k); w += 1 }
    }
    new GenericArrayData(mins)
  }

  /** non-ASCII fallback: ShingleOps' slow tokenization semantics, each
    * window joined as a String and digested over its UTF-8 bytes —
    * exactly what `md5(col)` hashes.
    */
  private def slowSigs(s: UTF8String, k: Int, n: Int): ArrayData = {
    val toks = s.trim().toLowerCase.toString.split("\\W+", -1).filter(_.nonEmpty)
    val mins = Array.fill(n)(Long.MaxValue)
    val hh = new Array[Long](2)
    def window(sh: String): Unit = {
      val b = sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      h1h2(b, b.length, hh)
      foldMins(mins, hh(0), hh(1))
    }
    if (toks.length < k) window(toks.mkString(" "))
    else (0 to toks.length - k).foreach(w => window(toks.slice(w, w + k).mkString(" ")))
    new GenericArrayData(mins)
  }

  /** static codegen target; see [[Md5LshBandHashes]]: per band, the
    * comma-joined decimal rendering of the band's signature slots is
    * digested once; band_hash = h1 + band·h2 (the EQUALITY hash — no
    * modulus), matching `Md5.hashPrepared(prepare(joined), b)`.
    */
  def lshBandHashes(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val buf = new Array[Byte](rowsPerBand * 21)
    val out = new Array[Long](bands)
    val hh = new Array[Long](2)
    val len = sig.numElements()
    var b = 0
    while (b < bands) {
      var pos = 0
      var i = b * rowsPerBand
      val end = math.min(len, i + rowsPerBand)
      while (i < end) {
        if (pos > 0) { buf(pos) = ','; pos += 1 }
        pos = MinHashOps.longToAscii(buf, pos, sig.getLong(i))
        i += 1
      }
      h1h2(buf, pos, hh)
      out(b) = hh(0) + b.toLong * hh(1)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** static codegen target; see [[Md5SimHash64]]. The Md5 family's 64
    * vote bits are h1's 48 bits (j < 48) then h2's low 16 (j ≥ 48) —
    * packed here into one word `h1 | (h2 & 0xffff) << 48` (h1 < 2^48,
    * so the ranges cannot overlap) and fed to the shared vote loop.
    * Null = no tokens (the composition's explode drops those docs).
    */
  def simhash64(s: UTF8String): java.lang.Long = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return slowSimhash(s); i += 1 }

    val votes = new Array[Int](64)
    var buf = new Array[Byte](32)
    val hh = new Array[Long](2)
    var any = false
    val n = bytes.length
    i = 0
    while (i < n) {
      while (i < n && !ShingleOps.isWord(bytes(i))) i += 1
      val start = i
      while (i < n && ShingleOps.isWord(bytes(i))) i += 1
      if (i > start) {
        any = true
        val len = i - start
        if (len > buf.length) buf = new Array[Byte](math.max(len, buf.length * 2))
        var j = 0
        while (j < len) {
          val b = bytes(start + j)
          buf(j) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
          j += 1
        }
        h1h2(buf, len, hh)
        SimHashOps.vote(votes, hh(0) | ((hh(1) & 0xffffL) << 48))
      }
    }
    if (!any) null else SimHashOps.pack(votes)
  }

  /** non-ASCII fallback: slow tokenization semantics, each token
    * digested over its UTF-8 bytes.
    */
  private def slowSimhash(s: UTF8String): java.lang.Long = {
    val toks = s.trim().toLowerCase.toString.split("\\W+", -1).filter(_.nonEmpty)
    if (toks.isEmpty) return null
    val votes = new Array[Int](64)
    val hh = new Array[Long](2)
    toks.foreach { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      h1h2(b, b.length, hh)
      SimHashOps.vote(votes, hh(0) | ((hh(1) & 0xffffL) << 48))
    }
    SimHashOps.pack(votes)
  }

  /** static codegen target; see [[Md5WinnowFp]] — the Md5-family twin of
    * [[WinnowOps.winnowFp]]: whitespace tokens (case/bytes preserved, no
    * fallback needed — ASCII whitespace never occurs inside a multi-byte
    * UTF-8 sequence), rank = h1(md5(token)) mod (2^31 − 1), O(n)
    * monotonic-deque window minima, sorted-distinct fingerprint, and
    * fp_hash = h1 + 1·h2 of md5(comma-joined decimals) (seed 1).
    */
  def winnowFp(s: UTF8String, w: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    val hh = new Array[Long](2)

    def isWs(b: Byte): Boolean = // Java regex \s = [ \t\n\x0B\f\r]
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

    var hashes = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      if (i > start) {
        if (nTok == hashes.length) hashes = java.util.Arrays.copyOf(hashes, nTok * 2)
        val tok = java.util.Arrays.copyOfRange(bytes, start, i)
        h1h2(tok, tok.length, hh)
        hashes(nTok) = hh(0) % RankModulus // rankHash(t, 0) = pmod(h1, M)
        nTok += 1
      }
    }

    val nWin = if (nTok == 0) 0 else math.max(nTok - w + 1, 1)
    val mins = new Array[Long](nWin)
    if (nTok > 0) {
      val win = math.min(w, nTok)
      val deque = new Array[Int](nTok)
      var head = 0; var tail = 0
      i = 0
      while (i < nTok) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - win) head += 1
        if (i >= win - 1) mins(i - win + 1) = hashes(deque(head))
        i += 1
      }
    }

    java.util.Arrays.sort(mins)
    var fpLen = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(fpLen) = mins(i); fpLen += 1 }
      i += 1
    }
    val fp = java.util.Arrays.copyOf(mins, fpLen)

    val buf = new Array[Byte](math.max(fpLen * 21, 1))
    var pos = 0
    i = 0
    while (i < fpLen) {
      if (pos > 0) { buf(pos) = ','; pos += 1 }
      pos = MinHashOps.longToAscii(buf, pos, fp(i))
      i += 1
    }
    h1h2(buf, pos, hh)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(fp), hh(0) + hh(1))) // hash(·, 1) = h1 + 1·h2
  }

  /** static codegen target; see [[WindowHashes]]. One hash per k-token
    * window of an ALREADY-TOKENIZED array (the dd12/pipe11 span-dedup
    * key): the window's tokens joined with single spaces (null elements
    * skipped, `array_join` semantics) and hashed at seed 0 under the
    * requested family — Md5: h1 (seed 0 ⇒ `h1 + 0·h2`); xxhash64:
    * `hashInt(0, hashLong(XXH64(bytes, 42), 42))`, the exact
    * `xxhash64(xxhash64(str), 0)` chain of the composition. Callers
    * gate on `size(tk) >= k`, so the output always has
    * `size(tk) − k + 1` elements here (kept total anyway: an under-k
    * array yields an empty result).
    */
  def windowHashes(tk: ArrayData, k: Int, useMd5: Boolean): ArrayData = {
    val n = tk.numElements()
    if (n < k) return new GenericArrayData(new Array[Long](0))
    // materialize element bytes once
    val elems = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val u = tk.getUTF8String(i)
      elems(i) = if (u == null) null else u.getBytes
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var buf = new Array[Byte](64)
    val hh = new Array[Long](2)
    var w = 0
    while (w <= n - k) {
      // join non-null elements of [w, w+k) with single spaces
      var len = 0
      var cnt = 0
      var t = w
      while (t < w + k) {
        if (elems(t) != null) { len += elems(t).length; cnt += 1 }
        t += 1
      }
      if (cnt > 1) len += cnt - 1
      if (len > buf.length) buf = new Array[Byte](math.max(len, buf.length * 2))
      var pos = 0
      var first = true
      t = w
      while (t < w + k) {
        if (elems(t) != null) {
          if (!first) { buf(pos) = ' '; pos += 1 }
          System.arraycopy(elems(t), 0, buf, pos, elems(t).length)
          pos += elems(t).length
          first = false
        }
        t += 1
      }
      if (useMd5) {
        h1h2(buf, pos, hh)
        out(w) = hh(0)
      } else {
        val hp = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, 42L)
        out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(0,
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(hp, 42L))
      }
      w += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused Md5-family MinHash signature — value-identical to
  * `Dedup.minhashSignaturesComposed(…, HashFamily.Md5)`: one MD5 digest
  * per k-shingle (distinct set skipped — a min over the multiset equals
  * the min over the set), rank_j = (h1 + j·h2) mod (2^31 − 1), fold
  * minima. One byte scan per document, zero explode rows, zero
  * aggregate exchanges — the dd02/dd03/dd10/dd11 oracle parameterization
  * now runs the same plan SHAPE as the production xx64 family.
  */
case class Md5MinHashSigs(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else if (numHashes < 1 || numHashes > 64)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires numHashes in [1, 64] (the 2^55 no-overflow " +
          s"seed bound), got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.minhashSigs(input.asInstanceOf[UTF8String], k, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Ops.minhashSigs($c, $k, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_minhash_sigs"
}

/** Fused Md5-family LSH band hashes — value-identical to the per-band
  * composition in `Dedup.lshBandsComposed(…, HashFamily.Md5)`: the
  * band's signature slots comma-joined as decimals, ONE digest, band
  * hash = h1 + band·h2. Same ragged-tail slice semantics as the xx64
  * [[LshBandHashes]].
  */
case class Md5LshBandHashes(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _)
        if bands >= 1 && bands <= 64 && rowsPerBand >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= bands <= 64 (the 2^55 no-overflow seed " +
          s"bound) and rowsPerBand >= 1, got ($bands, $rowsPerBand)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.lshBandHashes(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Ops.lshBandHashes($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_lsh_band_hashes"
}

/** Fused Md5-family 64-bit SimHash — value-identical to
  * `Dedup.simhashComposed(…, HashFamily.Md5)`: per token one digest,
  * vote bits = h1's 48 bits then h2's low 16 (`Md5.bitAt`), sign-packed.
  * Null when the document has no tokens (the composition's explode
  * drops those rows; callers filter like the xx64 [[SimHash64]] path).
  */
case class Md5SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("md5simhash")
      s"""
         |java.lang.Long $boxed = graft.functions.Md5Ops.simhash64($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_simhash64"
}

/** Fused Md5-family winnowing fingerprint — value-identical to
  * `TextAnalysis.winnowingFingerprintComposed(…, HashFamily.Md5)` (the
  * ta04 oracle parameterization); the xx64 twin is [[WinnowFp]]. See
  * [[Md5Ops.winnowFp]] for the pipeline; Md5FusedSpec pins fused ≡
  * composed, the ta04 DuckDB oracle pins the values cross-engine.
  */
case class Md5WinnowFp(child: Expression, window: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fingerprint",
      ArrayType(org.apache.spark.sql.types.LongType, containsNull = false),
      nullable = false),
    org.apache.spark.sql.types.StructField("fp_hash",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
    else if (window < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires window >= 1, got $window")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.winnowFp(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Ops.winnowFp($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_winnow_fp"
}

/** Fused k-token window hashes over a token ARRAY (the dd12 / pipe11
  * span-dedup key stage) — value-identical to the composition in
  * `Dedup.windowHashesComposed`:
  *
  *   transform(sequence(0, size(tk) - k),
  *     i => family.hash(array_join(slice(tk, i + 1, k), " "), 0))
  *
  * as one pass: each window's tokens joined into a reused scratch
  * buffer and hashed at seed 0 (Md5: h1; xx64: the exact
  * `xxhash64(xxhash64(str), 0)` chain). The composition runs three
  * nested interpreted higher-order functions and a fresh joined string
  * PER WINDOW (≈ per token); `posexplode` of this array yields the
  * same `(wpos, wh)` rows the count/semi-join stages consume.
  */
case class WindowHashes(child: Expression, k: Int, useMd5: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Ops.windowHashes(input.asInstanceOf[ArrayData], k, useMd5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Ops.windowHashes($c, $k, $useMd5)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "window_hashes"
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document n-gram COUNTING — the round-7 structural move for
  * the corpus-statistics operators (ta05 repetition / ta06 vocab / ta08
  * TF-IDF / ta09 n-gram counts). Their defining compositions all start
  *
  *   explode(one row per gram OCCURRENCE) → groupBy(doc, [n,] gram).count
  *
  * but a document is ONE row, so the per-doc count is a pure per-row
  * function: this kernel tokenizes once (`Dedup.tokens` semantics — the
  * FastTokens ASCII gate + non-ASCII regex fallback), slides every
  * requested n's windows, and emits the ALREADY-COUNTED
  * `(n, gram, c)` triples. Consumers explode `docs × distinct-grams`
  * rows instead of `docs × gram-occurrences` and — the bigger win — the
  * first `groupBy(doc, n, gram)` EXCHANGE disappears entirely (guide
  * §2.3 "aggregate before you shuffle" / §2.4 "remove shuffles
  * outright"): per-(doc, gram) counts are complete inside the row, so
  * the next aggregate (corpus cf/df, per-doc stats) partial-aggregates
  * straight off the projection.
  *
  * Value contract (pinned by GramCountsSpec against the compositions):
  * tokens = `filter(split(lower(trim(text)), "\\W+"), _ != "")`; for
  * each n in `ns` (in order), grams = the size−n+1 space-joined windows
  * (none when size < n — `TextAnalysis.ngrams`' guarded branch); counts
  * = occurrence counts per (n, gram); output order = first occurrence
  * within n, `ns` order across n (consumers aggregate, so order is
  * immaterial — fixed anyway for determinism).
  *
  * Output: `array<struct<n:int, gram:string, c:bigint>>`.
  */
case class GramCounts(child: Expression, ns: Seq[Int]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
    else if (ns.isEmpty || ns.exists(_ < 1) || ns.distinct != ns)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a non-empty list of distinct n >= 1, got $ns")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val nsArr: Array[Int] = ns.toArray

  override protected def nullSafeEval(input: Any): Any =
    GramOps.gramCounts(input.asInstanceOf[UTF8String], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the literal n-list through a codegen reference (arrays have
    // no Java literal form usable here)
    val nsRef = ctx.addReferenceObj("gramNs", nsArr, "int[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.GramOps.gramCounts($c, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gram_counts"
}

object GramOps {

  /** static codegen target; see [[GramCounts]]. */
  def gramCounts(s: UTF8String, ns: Array[Int]): ArrayData = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { if (bytes(i) < 0) ascii = false; i += 1 }
    val toks: scala.collection.mutable.ArrayBuffer[Array[Byte]] =
      if (ascii) ShingleOps.tokenizeAscii(bytes)
      else {
        val out = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
        s.trim().toLowerCase.toString.split("\\W+", -1).foreach { t =>
          if (t.nonEmpty) out += t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        out
      }

    val rows = new scala.collection.mutable.ArrayBuffer[Any]()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var ni = 0
    while (ni < ns.length) {
      val n = ns(ni)
      if (toks.length >= n) {
        counts.clear()
        var w = 0
        while (w <= toks.length - n) {
          // join toks[w, w+n) with single spaces
          var len = 0
          var t = w
          while (t < w + n) { len += toks(t).length; t += 1 }
          len += n - 1
          val out = new Array[Byte](len)
          var pos = 0
          t = w
          while (t < w + n) {
            if (t > w) { out(pos) = ' '; pos += 1 }
            System.arraycopy(toks(t), 0, out, pos, toks(t).length)
            pos += toks(t).length
            t += 1
          }
          val g = UTF8String.fromBytes(out)
          val c = counts.get(g)
          if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
          w += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          rows += new GenericInternalRow(
            Array[Any](n, e.getKey, e.getValue()(0)))
        }
      }
      ni += 1
    }
    new GenericArrayData(rows.toArray)
  }
}

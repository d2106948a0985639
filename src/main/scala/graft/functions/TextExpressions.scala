package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer for the FTS index (SURVEY.md §3.8): the distinct,
  * lowercased, length>1 word-character runs of a document, exactly
  *
  *   array_distinct(filter(split(lower(text), "\\W+"), t => length(t) > 1))
  *
  * re-expressed as ONE byte scan. The regex formulation allocates a
  * lowered copy of the whole document, a `Pattern.split` result array and
  * a String per token — profiled at ~8% of whole-crawl executor CPU and
  * ~20 GB of sampled allocation per bench run, in a workload that is
  * memory-bandwidth-bound at high core counts. The scan emits each token
  * once, ASCII-lowercased in place, deduplicated by hash.
  *
  * Equivalence: `\W` = [^a-zA-Z0-9_] (no UNICODE_CHARACTER_CLASS), so
  * tokens are exactly maximal ASCII word-char runs and multi-byte UTF-8
  * sequences are separators (high-bit bytes can never be word chars) —
  * byte-level scanning is safe even mid-codepoint. `lower` only affects
  * A-Z inside tokens. The ONE divergence is exotic uppercase codepoints
  * whose lowercase expands to sequences CONTAINING ASCII word chars
  * (e.g. İ → i + combining dot): the regex path tokenizes the expansion,
  * so inputs containing any non-ASCII byte take a fallback that mirrors
  * the Spark semantics (`UTF8String.toLowerCase` then regex split).
  * Property-tested against the regex definition in FastScanSpec.
  */
case class FastTerms(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // SQL-callable as `fast_terms`; without an input contract a non-string
  // argument passes analysis and dies at runtime in TextOps.fastTerms —
  // make misuse an analysis-time error instead.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    TextOps.fastTerms(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.fastTerms($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fast_terms"
}

object TextOps {

  private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  /** static codegen target; see [[FastTerms]]. */
  def fastTerms(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return slowTerms(s); i += 1 }

    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isWord(bytes(i))) i += 1
      val start = i
      while (i < n && isWord(bytes(i))) i += 1
      if (i - start > 1) {
        val tok = java.util.Arrays.copyOfRange(bytes, start, i)
        var k = 0
        while (k < tok.length) {
          if (tok(k) >= 'A' && tok(k) <= 'Z') tok(k) = (tok(k) + 32).toByte
          k += 1
        }
        val u = UTF8String.fromBytes(tok)
        if (seen.add(u)) out += u
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** non-ASCII fallback: Spark-semantics lower, then the defining regex. */
  private def slowTerms(s: UTF8String): ArrayData = {
    val toks = s.toLowerCase.toString.split("\\W+")
    val seen = new java.util.LinkedHashSet[String]()
    toks.foreach(t => if (t.length > 1) seen.add(t))
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

object TextExpressions {

  @volatile private var registeredIn: SparkSession = _

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("fast_terms",
      exprs => FastTerms(exprs.head), "built-in")
    registeredIn = spark
  }

  private def ensure(): Unit = {
    val s = SparkSession.active
    if (registeredIn ne s) register(s)
  }

  def fast_terms(col: Column): Column = { ensure(); call_function("fast_terms", col) }
}

package graft.functions

import graft.url.{Urls, EnqueueSeq}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot URL functions (SURVEY.md §3.10
  * U1 upgrade path): unlike Scala UDFs these stay inside whole-stage
  * codegen — `doGenCode` emits a direct static call, no
  * serialization/Option boxing per row, null handling handled by the
  * generated null-check. Registered for SQL via [[UrlExpressions.register]].
  */
abstract class UrlStringExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  /** fully-qualified static call target, e.g. "graft.functions.UrlOps.canon" */
  protected def staticCall: String

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(evalString(input.toString))

  protected def evalString(s: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($staticCall($c.toString()))")
}

case class CanonicalizeUrl(child: Expression) extends UrlStringExpression {
  override protected def staticCall: String = "graft.functions.UrlOps.canon"
  override protected def evalString(s: String): String = Urls.canonicalize(s)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "canonicalize_url"
}

case class UrlFingerprint(child: Expression) extends UrlStringExpression {
  override protected def staticCall: String = "graft.functions.UrlOps.fingerprint"
  override protected def evalString(s: String): String = Urls.fingerprint(s)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_fingerprint"
}

case class UrlHost(child: Expression) extends UrlStringExpression {
  override protected def staticCall: String = "graft.functions.UrlOps.host"
  override protected def evalString(s: String): String = Urls.hostOf(s)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_host"
}

case class UrlPath(child: Expression) extends UrlStringExpression {
  override protected def staticCall: String = "graft.functions.UrlOps.path"
  override protected def evalString(s: String): String = Urls.pathOf(s)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "url_path"
}

/** Static call targets for generated code (codegen can't reference Scala
  * objects with $ mangling reliably — plain static forwarders).
  */
object UrlOps {
  def canon(s: String): String = Urls.canonicalize(s)
  def fingerprint(s: String): String = Urls.fingerprint(s)
  def host(s: String): String = Urls.hostOf(s)
  def path(s: String): String = Urls.pathOf(s)
}

object UrlExpressions {

  @volatile private var registeredIn: SparkSession = _

  /** Register in the session's FunctionRegistry (available to both the
    * Column API via `call_function` and to `spark.sql`). Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("canonicalize_url",
      exprs => CanonicalizeUrl(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_fingerprint",
      exprs => UrlFingerprint(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_host",
      exprs => UrlHost(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_path",
      exprs => UrlPath(exprs.head), "built-in")
    registeredIn = spark
  }

  private def ensure(): Unit = {
    val s = SparkSession.active
    if (registeredIn ne s) register(s)
  }

  def canonicalize_url(col: Column): Column = { ensure(); call_function("canonicalize_url", col) }
  def url_fingerprint(col: Column): Column = { ensure(); call_function("url_fingerprint", col) }
  def url_host(col: Column): Column = { ensure(); call_function("url_host", col) }
  def url_path(col: Column): Column = { ensure(); call_function("url_path", col) }
}

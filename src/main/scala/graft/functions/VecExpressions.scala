package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two numeric arrays — value-identical to the
  * Catalyst composition in `Similarity.dotComposed`:
  *
  *   aggregate(zip_with(u, v, (a, b) => a.cast(double) * b.cast(double)),
  *     0.0, (acc, x) => acc + x)
  *
  * as ONE codegen'd loop. The composition runs two interpreted
  * higher-order functions PER PAIR — and the ANN paths evaluate it three
  * times per scored pair (dot + both norms), making it the dominant
  * ann01/dd07 cost at sf0.1. Semantics replicated exactly: the left
  * fold's accumulation order (IEEE doubles are order-sensitive), float→
  * double exact widening, NULL when either array is null, when lengths
  * differ (zip_with pads the shorter side with nulls, which nulls the
  * fold), or when any element is null. VecDotSpec pins fused ≡ composed;
  * the ann01/ann02/ann03/dd06/dd07/dd08 oracles pin the values
  * cross-engine.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT|DOUBLE> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val lf = isFloat(left.dataType)
  private lazy val rf = isFloat(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lf, rf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotv")
      s"""
         |java.lang.Double $boxed = graft.functions.VecOps.dot($a, $b, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object VecOps {

  /** static codegen target; see [[DotProduct]]. Null mirrors the
    * composition: length mismatch or any null element → null.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

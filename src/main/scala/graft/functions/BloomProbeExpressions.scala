package graft.functions

import graft.dedup.FastBloom
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd probes against a broadcast [[FastBloom]] — the hot
  * membership tests of the crawl loop (corpus-fetch prefilter, seen-set
  * prefilter). The Scala-UDF formulation they replace decoded every
  * UTF8String to a String and re-encoded it to bytes per probe (two
  * copies + Provider-free but allocation-heavy); these hash the
  * UTF8String's bytes IN PLACE ([[FastBloom.mightContainUTF8]]) and stay
  * inside whole-stage codegen.
  *
  * Null semantics match the UDFs they replace: null input → false (not
  * null), so the expressions are non-nullable and filters need no extra
  * null guard.
  */
case class FastBloomMightContain(child: Expression, bloomBc: Broadcast[FastBloom])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && bloomBc.value.mightContainUTF8(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val bloomCls = classOf[FastBloom].getName
    // reference the BROADCAST (a small handle serialized per task), not
    // the filter value — the filter bytes ship once per executor via the
    // broadcast machinery; resolve .value() once per task into state
    val bcRef = ctx.addReferenceObj("fastBloomBc", bloomBc, classOf[Broadcast[_]].getName)
    val bloomVar = ctx.addMutableState(bloomCls, "fastBloom",
      v => s"$v = ($bloomCls) $bcRef.value();")
    ev.copy(
      code = code"""
        ${childGen.code}
        final boolean ${ev.value} = !${childGen.isNull} &&
          $bloomVar.mightContainUTF8(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fast_bloom_might_contain"
}

/** Sharded probe: `shard` selects which of the 2^b per-shard broadcasts
  * to consult (SeenSet's multi-GB regime). Shard values are resolved
  * LAZILY per task — a task whose rows all map to one shard (the
  * co-partitioned layout) fetches exactly that one broadcast, preserving
  * the per-executor residency bound sharding exists for.
  */
case class ShardedFastBloomMightContain(
    left: Expression, right: Expression, bloomBcs: Array[Broadcast[FastBloom]])
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, INT) inputs, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def eval(input: InternalRow): Any = {
    val fp = left.eval(input)
    fp != null && {
      val s = right.eval(input).asInstanceOf[Int]
      bloomBcs(s).value.mightContainUTF8(fp.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fpGen = left.genCode(ctx)
    val shGen = right.genCode(ctx)
    val bloomCls = classOf[FastBloom].getName
    val bcCls = classOf[Broadcast[_]].getName
    val arrRef = ctx.addReferenceObj("fastBloomBcs", bloomBcs, s"$bcCls[]")
    val shardsVar = ctx.addMutableState(s"$bloomCls[]", "fastBloomShards",
      v => s"$v = new $bloomCls[${bloomBcs.length}];")
    val idx = ctx.freshName("shardIdx")
    ev.copy(
      code = code"""
        ${fpGen.code}
        ${shGen.code}
        boolean ${ev.value} = false;
        if (!${fpGen.isNull}) {
          final int $idx = ${shGen.value};
          if ($shardsVar[$idx] == null) {
            $shardsVar[$idx] = ($bloomCls) $arrRef[$idx].value();
          }
          ${ev.value} = $shardsVar[$idx].mightContainUTF8(${fpGen.value});
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sharded_fast_bloom_might_contain"
}

/** Column-API entry points. */
object BloomProbe {
  def mightContain(bc: Broadcast[FastBloom], c: Column): Column =
    ColumnShim.column(FastBloomMightContain(ColumnShim.expression(c), bc))

  def mightContainSharded(
      bcs: Array[Broadcast[FastBloom]], fp: Column, shard: Column): Column =
    ColumnShim.column(ShardedFastBloomMightContain(
      ColumnShim.expression(fp), ColumnShim.expression(shard), bcs))
}

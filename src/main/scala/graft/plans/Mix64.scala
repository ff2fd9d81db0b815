package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst `mix64(x)` — SplitMix64's output scrambler (one
  * wrap-add, three wrap-multiply/xor-shift rounds) as a codegen'd
  * expression. This is the engine's PORTABLE 64-bit scrambler: unlike
  * `xxhash64`, a SQL oracle replays it in a handful of staged
  * mod-2^64 operations (see KernelQueries.k2OracleSql), which is what
  * lets seeded Monte-Carlo and deterministic-shuffle queries be
  * hash-checked by a second engine. Used as the per-row RNG seed (k2)
  * and the epoch-shuffle sort key (x32).
  *
  * Native expression, not a UDF: the scramble compiles straight into
  * whole-stage codegen (three multiplies and xors on a primitive long —
  * no boxing, no serialization boundary), so a 100 TB shuffle-key
  * projection stays in the generated loop.
  */
case class Mix64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a BIGINT argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "mix64"

  override protected def nullSafeEval(input: Any): Any =
    graft.domain.Openness.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      s"""
        long $z = $c + 0x9E3779B97F4A7C15L;
        $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
        $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
        ${ev.value} = $z ^ ($z >>> 31);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

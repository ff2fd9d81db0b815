package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst `cosine_sim(a, b)` over two embedding arrays — the hot
  * scalar of the similarity family (v1 brute-force top-k, v2 near-dup,
  * v3 LSH re-rank; reference's cosine kernels live in
  * `DefPosModel.ipynb:143-147` distance math territory).
  *
  * Full codegen: the dot/norm loop compiles into whole-stage-generated
  * Java — no UDF boundary, no Seq[Float] boxing/conversion (the previous
  * JVM-UDF fast path deserialized each ArrayData into a Scala Seq per
  * row; this reads the raw array buffer in place). At 100 TB the
  * similarity scan is compute-bound on exactly this loop.
  *
  * Fold order is pinned left-to-right in DOUBLE — bitwise-identical to
  * both the previous UDF and DuckDB's `list_reduce` oracle mirror, so
  * scores hash-match pre-round. Null elements inside an embedding are
  * not expected (schema is array<float> of dense vectors); a LENGTH
  * MISMATCH returns null, matching the HOF mirror (`zip_with` pads with
  * null, poisoning the fold) rather than silently scoring a prefix.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (aa.numElements() != bb.numElements()) return null
    val n = aa.numElements()
    val (fa, fb) = (isFloat(left), isFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (fb) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = (double) $a.$getA($i);
            double $y = (double) $b.$getB($i);
            $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

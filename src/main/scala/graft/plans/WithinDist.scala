package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Native Catalyst predicate `within_dist(x, y, cx, cy, r)` ⇔
  * (x−cx)² + (y−cy)² ≤ r² — the hot predicate of the openness/serving
  * path ("is this defender within reach radius r of the receiver"),
  * SURVEY.md §7.3 case (b): a scalar the built-ins express only as a
  * sqrt/pow tree that the data-source layer cannot push down.
  *
  * Full codegen (`doGenCode`): the comparison compiles into the
  * whole-stage-generated Java — no UDF boundary, no boxing, no sqrt.
  * `DistancePushdownRule` rewrites a Filter over this predicate to
  * prepend sargable bounding-box conjuncts, which Parquet then uses for
  * row-group skipping (see the rule's scaladoc).
  *
  * `expanded` marks predicates the rule has already rewritten so the
  * optimizer reaches a fixpoint.
  */
case class WithinDist(
    x: Expression, y: Expression, cx: Expression, cy: Expression, r: Expression,
    expanded: Boolean = false)
  extends Expression {

  override def children: Seq[Expression] = Seq(x, y, cx, cy, r)
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"within_dist requires 5 DOUBLE arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "within_dist"

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) null
    else {
      val Seq(xv, yv, cxv, cyv, rv) = vals.map(_.asInstanceOf[Double])
      val dx = xv - cxv
      val dy = yv - cyv
      dx * dx + dy * dy <= rv * rv
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val Seq(xe, ye, cxe, cye, re) = evals
    val dx = ctx.freshName("dx")
    val dy = ctx.freshName("dy")
    val childCode = evals.map(_.code.toString).mkString("\n")
    val isNullExpr = evals.map(_.isNull.toString).mkString(" || ")
    ev.copy(code =
      code"""
        $childCode
        boolean ${ev.isNull} = $isNullExpr;
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          double $dx = ${xe.value} - ${cxe.value};
          double $dy = ${ye.value} - ${cye.value};
          ${ev.value} = $dx * $dx + $dy * $dy <= ${re.value} * ${re.value};
        }
      """)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(x = newChildren(0), y = newChildren(1), cx = newChildren(2),
         cy = newChildren(3), r = newChildren(4))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — the canonical example of "an operator Spark
  * lacks" (builder prompt §custom operators, case (a): composed from
  * existing operators, which the semantics fully allow).
  *
  * For each left row, attach the LATEST right row whose time is ≤ the
  * left row's time within the same key group (inclusive at equality —
  * matching DuckDB/kdb ASOF semantics). Formulated as union + ordered
  * window `last(_, ignoreNulls)` rather than a join:
  *
  *  - ONE shuffle on the keys and one sort by (time, side) — no
  *    range-join explosion, no per-key cross product;
  *  - at 100 TB this is the shape that scales: cost is the same as a
  *    single window aggregation over both inputs; skew follows key
  *    volume and is salt-able like any window;
  *  - ties: the right row sorts BEFORE the left row at equal time, so
  *    an exactly-simultaneous right row is visible (ASOF `>=`).
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            rightPrefix: String = "asof_"): DataFrame = {
    val lPacked = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__lrow")): _*)
    val rPacked = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(right.columns.map(col): _*).as("__rrow")): _*)
    val unioned = lPacked
      .withColumn("__rrow", lit(null).cast(rPacked.schema("__rrow").dataType))
      .unionByName(rPacked.withColumn("__lrow",
        lit(null).cast(lPacked.schema("__lrow").dataType)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last("__rrow", ignoreNulls = true).over(w))
      .filter(col("__lrow").isNotNull)
      .select(left.columns.map(c => col(s"__lrow.$c").as(c)) ++
              right.columns.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }
}

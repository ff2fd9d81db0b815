package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic bounded-window range join — the second operator the builder
  * prompt names as missing from Spark (after as-of). Attaches to each
  * left row every right row of the same keys whose time falls in
  * [leftTime − window, leftTime].
  *
  * Spark plans a raw `r.ts BETWEEN l.ts − w AND l.ts` condition as a
  * broadcast-nested-loop (O(|L|·|R|) within key groups). This
  * formulation buckets both sides by ⌊epoch/window⌋ — a right row can
  * only match left rows in its own or the following bucket, so the left
  * side explodes into exactly two bucket probes and the join becomes a
  * plain equi-join on (keys, bucket) with the exact range applied as a
  * post-filter:
  *
  *  - join input ≤ 2·|L| + |R| rows, uniform bucket keys, one shuffle;
  *  - at 100 TB: same shape as any equi-join — AQE/salting apply as
  *    usual, no quadratic blowup, bucket width tunes the expansion
  *    factor vs selectivity trade.
  */
object RangeJoin {

  /** Right rows with rightTime ∈ [leftTime − windowSec, leftTime]. */
  def within(left: DataFrame, right: DataFrame, keys: Seq[String],
             leftTime: String, rightTime: String, windowSec: Long,
             rightPrefix: String = "r_"): DataFrame = {
    val lb = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__b", explode(array(
        floor(col("__lt") / (windowSec * 1000000L)) - 1,
        floor(col("__lt") / (windowSec * 1000000L)))))
    val rPacked = right.select(
      keys.map(col) ++ Seq(
        unix_micros(col(rightTime)).as("__rt"),
        struct(right.columns.map(col): _*).as("__rrow")): _*)
      .withColumn("__b", floor(col("__rt") / (windowSec * 1000000L)))
    lb.join(rPacked, keys :+ "__b")
      .filter(col("__rt") >= col("__lt") - windowSec * 1000000L &&
              col("__rt") <= col("__lt"))
      .select(left.columns.map(col) ++
              right.columns.map(c => col(s"__rrow.$c").as(s"$rightPrefix$c")): _*)
    // no dedup needed: the two probed buckets are distinct values and a
    // right row carries exactly one bucket, so each pair joins once
  }
}

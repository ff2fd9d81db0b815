package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-union gap-fill resampling + linear interpolation — the single
  * implementation behind `w21_resample_lerp` and `ResampleLerpSpec`'s
  * closed-form cases (one copy, so the spec exercises the registered
  * query's exact logic; the streaming twin is
  * `streaming.StreamOps.resampleLerp`).
  *
  * Semantics (shared with the DuckDB oracle, see the w21 SQL): per
  * series, a step-aligned grid spans [floor_step(min t), max t]; grid
  * points and observations union into ONE sort, two frames recover the
  * bracketing observations, and the lerp is one fixed IEEE expression
  * tree. A grid point exactly on an observation sorts after it, so
  * prev_t = t and the factor is exactly 0.
  */
object ResampleLerp {

  /** ev: (user_id, t: long epoch micros, value: double, event_id: long).
    * Returns (user_id, grid_us, v_interp), unordered.
    */
  def gridLerp(ev: DataFrame, stepUs: Long): DataFrame = {
    val obs = ev.select(col("user_id"), col("t"), col("value"),
                        col("event_id"), lit(0).as("is_grid"))
    val grid = obs.groupBy("user_id")
      .agg(min("t").as("g0"), max("t").as("g1"))
      .select(col("user_id"),
        explode(sequence(expr(s"g0 div $stepUs * $stepUs"), col("g1"),
                         lit(stepUs))).as("t"),
        lit(null).cast("double").as("value"), lit(-1L).as("event_id"),
        lit(1).as("is_grid"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("t"), col("is_grid"), col("event_id"))
    val wp = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsOnly = (c: String) => when(col("is_grid") === 0, col(c))
    obs.unionByName(grid)
      // all four bracketing columns in ONE select: chained withColumn
      // interposes Projects that defeat CollapseWindow, planning four
      // stacked Window execs; a single projection collapses them into
      // one Window exec (same partition+order — WindowExec evaluates
      // both frame directions in one buffered pass per group)
      .select(col("*"),
        last(obsOnly("value"), ignoreNulls = true).over(wp).as("prev_v"),
        last(obsOnly("t"), ignoreNulls = true).over(wp).as("prev_t"),
        first(obsOnly("value"), ignoreNulls = true).over(wn).as("next_v"),
        first(obsOnly("t"), ignoreNulls = true).over(wn).as("next_t"))
      .filter(col("is_grid") === 1)
      .withColumn("v_interp",
        when(col("prev_t").isNull, col("next_v"))
          .when(col("next_t").isNull, col("prev_v"))
          .when(col("next_t") === col("prev_t"), col("prev_v"))
          .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
            ((col("t") - col("prev_t")).cast("double") /
             (col("next_t") - col("prev_t")).cast("double"))))
      .select(col("user_id"), col("t").as("grid_us"), col("v_interp"))
  }
}

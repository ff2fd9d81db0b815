package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of w21_resample_lerp beyond the DuckDB hash check: grid
  * geometry, interpolation bounds, and exact passthrough at observation
  * times. */
class ResampleLerpSpec extends SparkSpec {

  private val hourUs = 3600L * 1000000L

  private lazy val out = graft.SparkEntry.queries("w21_resample_lerp")(spark, sfDir)
    .cache()
  private lazy val ev = graft.Tables.load(spark, sfDir, "events")
    .select(col("user_id"), unix_micros(col("ts")).as("t"), col("value"))
    .cache()

  test("grid covers [floor_hour(first), last] with hourly step, per user") {
    val gridAgg = out.groupBy("user_id")
      .agg(min("grid_us").as("gmin"), max("grid_us").as("gmax"),
           count(lit(1)).as("n"))
    val spanAgg = ev.groupBy("user_id")
      .agg(min("t").as("t0"), max("t").as("t1"))
    val bad = gridAgg.join(spanAgg, "user_id")
      .filter(col("gmin") =!= expr(s"t0 div $hourUs * $hourUs") ||
              col("gmax") > col("t1") || col("gmax") + hourUs <= col("t1") ||
              col("n") =!= (col("gmax") - col("gmin")) / hourUs + 1)
    assert(bad.count() == 0)
    // every grid point is hour-aligned
    assert(out.filter(pmod(col("grid_us"), lit(hourUs)) =!= 0).count() == 0)
  }

  test("interpolated values are bounded by the bracketing observations") {
    // v_interp must lie within [min, max] of the user's values — lerp
    // never extrapolates
    val bounds = ev.groupBy("user_id")
      .agg(min("value").as("vmin"), max("value").as("vmax"))
    val bad = out.join(bounds, "user_id")
      .filter(col("v_interp") < col("vmin") - 1e-9 ||
              col("v_interp") > col("vmax") + 1e-9)
    assert(bad.count() == 0)
  }

  test("a grid point landing exactly on an observation reproduces its value") {
    import spark.implicits._
    // synthetic micro-case exercised through the registered query path is
    // oracle territory; here check the closed form directly: obs at grid
    // times t=0h,2h with values 10, 30 -> grid at 0h,1h,2h = 10, 20, 30
    val df = Seq((1L, 0L * hourUs, 10.0, 1L), (1L, 2 * hourUs, 30.0, 2L))
      .toDF("user_id", "t", "value", "event_id")
    val lerped = ResampleLerpSpec.lerpOf(spark, df, hourUs)
    assert(lerped === Seq(10.0, 20.0, 30.0))
  }

  test("single-observation user: entire grid holds that value") {
    import spark.implicits._
    val df = Seq((7L, hourUs + 17L, 42.5, 1L)).toDF("user_id", "t", "value", "event_id")
    assert(ResampleLerpSpec.lerpOf(spark, df, hourUs) === Seq(42.5))
  }
}

object ResampleLerpSpec {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.expressions.Window

  /** The w21 core on a prepared (user_id, t, value, event_id) frame —
    * shared shape with the registered query, used for closed-form cases. */
  def lerpOf(spark: SparkSession, ev0: DataFrame, hourUs: Long): Seq[Double] = {
    val ev = ev0.withColumn("is_grid", lit(0))
    val grid = ev.groupBy("user_id")
      .agg(min("t").as("g0"), max("t").as("g1"))
      .select(col("user_id"),
        explode(sequence(expr(s"g0 div $hourUs * $hourUs"), col("g1"),
                         lit(hourUs))).as("t"),
        lit(null).cast("double").as("value"), lit(-1L).as("event_id"),
        lit(1).as("is_grid"))
    val ord = Window.partitionBy("user_id")
      .orderBy(col("t"), col("is_grid"), col("event_id"))
    val wp = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = (c: String) => when(col("is_grid") === 0, col(c))
    ev.unionByName(grid)
      .withColumn("prev_v", last(obs("value"), ignoreNulls = true).over(wp))
      .withColumn("prev_t", last(obs("t"), ignoreNulls = true).over(wp))
      .withColumn("next_v", first(obs("value"), ignoreNulls = true).over(wn))
      .withColumn("next_t", first(obs("t"), ignoreNulls = true).over(wn))
      .filter(col("is_grid") === 1)
      .withColumn("v", when(col("prev_t").isNull, col("next_v"))
        .when(col("next_t").isNull, col("prev_v"))
        .when(col("next_t") === col("prev_t"), col("prev_v"))
        .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
          ((col("t") - col("prev_t")).cast("double") /
           (col("next_t") - col("prev_t")).cast("double"))))
      .orderBy("t").select("v").collect().map(_.getDouble(0)).toSeq
  }
}

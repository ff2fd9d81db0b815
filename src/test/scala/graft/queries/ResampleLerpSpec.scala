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

  // closed-form cases run the REGISTERED implementation —
  // operators.ResampleLerp.gridLerp is the single copy behind both the
  // w21 query and these tests
  private def lerpOf(df: org.apache.spark.sql.DataFrame): Seq[Double] =
    graft.operators.ResampleLerp.gridLerp(df, hourUs)
      .orderBy("grid_us").select("v_interp")
      .collect().map(_.getDouble(0)).toSeq

  test("a grid point landing exactly on an observation reproduces its value") {
    import spark.implicits._
    // obs at grid times t=0h,2h with values 10, 30 -> grid 0h,1h,2h = 10,20,30
    val df = Seq((1L, 0L * hourUs, 10.0, 1L), (1L, 2 * hourUs, 30.0, 2L))
      .toDF("user_id", "t", "value", "event_id")
    assert(lerpOf(df) === Seq(10.0, 20.0, 30.0))
  }

  test("single-observation user: entire grid holds that value") {
    import spark.implicits._
    val df = Seq((7L, hourUs + 17L, 42.5, 1L)).toDF("user_id", "t", "value", "event_id")
    assert(lerpOf(df) === Seq(42.5))
  }

  // Round 13: the obs-only-window rewrite resolves brackets via lead()
  // over (t, event_id) — these cases pin the tie rules the old
  // union+frame form encoded implicitly, so a future re-plan cannot
  // silently change them.

  test("duplicate timestamps: prev = highest event_id, next = lowest of the following run") {
    import spark.implicits._
    // two obs at t=0h (values 10 then 14, event_ids 1 < 2) and two at
    // t=2h (values 30 then 34, ids 3 < 4). Grid 0h lands exactly on the
    // t=0 run -> takes the LAST duplicate (14, the one later in
    // (t, event_id) order); grid 1h lerps between that prev (14) and
    // the FIRST obs of the next run (30) -> 22; grid 2h lands on the
    // t=2h run -> its last duplicate is prev with factor 0... which is
    // 34.
    val df = Seq(
      (1L, 0L, 10.0, 1L), (1L, 0L, 14.0, 2L),
      (1L, 2 * hourUs, 30.0, 3L), (1L, 2 * hourUs, 34.0, 4L))
      .toDF("user_id", "t", "value", "event_id")
    assert(lerpOf(df) === Seq(14.0, 22.0, 34.0))
  }

  test("negative (pre-epoch) timestamps: grid stays on floor/ceil multiples") {
    import spark.implicits._
    // obs at t = -1.5h and +0.5h: the head floor must be -2h (not -1h,
    // which truncate-toward-zero `div` would give), and the grid points
    // owned by the -1.5h obs must start at its ceil multiple -1h (the
    // round-13 `(t + step-1) div step * step` computed 0 here and
    // silently dropped the -1h row). Expect grid -2h (head, value 10),
    // -1h (lerp), 0h (lerp) — and the grid must stop before +0.5h.
    val df = Seq(
      (7L, -3 * hourUs / 2, 10.0, 1L), (7L, hourUs / 2, 30.0, 2L))
      .toDF("user_id", "t", "value", "event_id")
    val got = graft.operators.ResampleLerp.gridLerp(df, hourUs)
      .orderBy("grid_us")
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._1) === Seq(-2 * hourUs, -hourUs, 0L))
    assert(got.head._2 === 10.0)                       // head segment
    assert(got(1)._2 === 10.0 + 20.0 * 0.25)           // -1h: 1/4 of [-1.5h, .5h]
    assert(got(2)._2 === 10.0 + 20.0 * 0.75)           // 0h: 3/4
  }

  test("head grid points before the first observation take the first obs value") {
    import spark.implicits._
    // first obs at 1h+1us -> grid starts at floor(1h) = 1h, which is
    // BEFORE the obs: prev is null there, so the head point takes the
    // next (= first) obs value; 2h lerps; 3h is past the last obs grid
    val df = Seq((9L, hourUs + 1L, 10.0, 1L), (9L, 3 * hourUs + 1L, 30.0, 2L))
      .toDF("user_id", "t", "value", "event_id")
    assert(lerpOf(df).size == 3) // 1h, 2h, 3h
    val vs = lerpOf(df)
    assert(vs.head === 10.0)                 // head segment
    assert(vs(1) > 10.0 && vs(1) < 30.0)     // interior lerp
    assert(vs(2) > vs(1) && vs(2) < 30.0)    // still before the 2nd obs
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds for the a20 sketch aggregates: HLL++ at rsd=0.02 and
  * approx_percentile at accuracy=1000 must track their exact twins. */
class SketchSpec extends SparkSpec {

  test("sketch aggregates stay within error bounds of their exact twins") {
    val rows = graft.SparkEntry.queries("a20_approx_sketches")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactU = r.getAs[Long]("exact_users").toDouble
      val approxU = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approxU - exactU) / exactU <= 0.10,
        s"${r.getString(0)}: HLL $approxU vs exact $exactU")
      val exactM = r.getAs[Double]("exact_median")
      val approxM = r.getAs[Double]("approx_median")
      // approx_percentile returns a true element near the requested rank;
      // bound relatively rather than by equality
      assert(math.abs(approxM - exactM) <=
        math.max(1.0, math.abs(exactM) * 0.10),
        s"${r.getString(0)}: p50 $approxM vs exact $exactM")
    }
  }

  test("sketches are deterministic across partitionings (mergeable state)") {
    val base = graft.Tables.load(spark, sfDir, "events")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("u"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg(base) == agg(base.repartition(13)))
  }

  test("count-min sketch bounds the exact heavy-hitter counts") {
    val tok = graft.Tables.load(spark, sfDir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .cache()
    val total = tok.count()
    val eps = 0.001
    val cms = tok.stat.countMinSketch("token", eps, 0.99, seed = 42)
    val exact = graft.SparkEntry.queries("x21_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.nonEmpty, "no heavy hitters at this SF")
    exact.foreach { case (t, freq) =>
      val est = cms.estimateCount(t)
      assert(est >= freq, s"CMS underestimated '$t': $est < $freq")
      assert(est <= freq + (eps * total).toLong,
        s"CMS overestimate out of bound for '$t': $est vs $freq + ${eps * total}")
    }
  }
}

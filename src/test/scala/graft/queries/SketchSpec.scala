package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds for the sketch estimates the engine publishes: a20's
  * graft hll_sketch estimate vs its exact twin (the oracle gate checks
  * VALUES; this spec checks the statistical CONTRACT — the published
  * band label and basis-point error are mutually consistent and within
  * the m=64 error envelope), plus the Spark built-ins used as scale
  * references (approx_count_distinct mergeability, approx_percentile
  * rank error, countMinSketch bounds). */
class SketchSpec extends SparkSpec {

  test("a20: published band/err_bp are self-consistent and within envelope") {
    val rows = graft.SparkEntry.queries("a20_approx_sketches")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users")
      val est = r.getAs[Long]("est_users")
      val errBp = r.getAs[Long]("err_bp")
      val band = r.getAs[String]("band")
      assert(Set("raw", "linear_counting").contains(band))
      assert(errBp == math.abs(est - exact) * 10000L / exact,
        s"${r.getString(0)}: err_bp $errBp inconsistent with |$est - $exact|")
      // m=64 → ~13% standard error on the raw branch; 30% ≈ 2.3σ. The
      // linear-counting branch is tighter on average but NOISY right at
      // the 5m/2 cutoff (V is small, so ±1 zero register moves the
      // estimate ~m/V ≈ 10%) — one envelope covers both branches.
      assert(math.abs(est - exact).toDouble / exact <= 0.30,
        s"${r.getString(0)}: HLL $est vs exact $exact outside the 30% band")
    }
  }

  test("approx_percentile tracks the exact median (scale-reference built-in)") {
    val rows = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact_median"),
           expr("approx_percentile(value, 0.5, 1000)").as("approx_median"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
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

  test("a36: moment registers merge by ADDITION across any split") {
    // the property that makes the moments sketch the family's quantile
    // member: state is (n, Σq..Σq⁴), so merging partitions is exact
    // integer addition — order-independent, retry-safe. Verify the
    // whole-table registers equal the sum of two disjoint halves'
    // registers, per group.
    import org.apache.spark.sql.functions._
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qv"),
              col("l_orderkey"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qv").as("s1"),
             sum(expr("qv * qv")).as("s2"),
             sum(expr("qv * qv * qv")).as("s3"),
             sum(expr("qv * qv * qv * qv")).as("s4"))
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
                                     r.getLong(4), r.getLong(5))).toMap
    val whole = regs(li)
    val a = regs(li.filter(col("l_orderkey") % 2 === 0))
    val b = regs(li.filter(col("l_orderkey") % 2 =!= 0))
    whole.foreach { case (g, (n, s1, s2, s3, s4)) =>
      def p(m: Map[String, (Long, Long, Long, Long, Long)], i: Int) =
        m.get(g).map(t => t.productElement(i).asInstanceOf[Long]).getOrElse(0L)
      assert(n == p(a, 0) + p(b, 0) && s1 == p(a, 1) + p(b, 1) &&
             s2 == p(a, 2) + p(b, 2) && s3 == p(a, 3) + p(b, 3) &&
             s4 == p(a, 4) + p(b, 4), s"group $g: split registers don't add")
    }
  }

  test("a36: Cornish-Fisher estimates land near the exact quantiles") {
    // the estimator contract (not the oracle's value check): on this
    // near-uniform quantity distribution CF from four moments must sit
    // within 2 quantity units of the exact interpolated quantile —
    // loose enough to be stable, tight enough to catch a formula slip
    // (a sign error in the skew/kurtosis terms lands ~5-10 units off)
    val rows = graft.SparkEntry.queries("a36_moments_quantiles")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p50e = r.getAs[Double]("p50_est"); val p50x = r.getAs[Double]("p50_exact")
      val p90e = r.getAs[Double]("p90_est"); val p90x = r.getAs[Double]("p90_exact")
      assert(math.abs(p50e - p50x) < 2.0,
        s"${r.getString(0)}: p50 est $p50e vs exact $p50x")
      assert(math.abs(p90e - p90x) < 2.0,
        s"${r.getString(0)}: p90 est $p90e vs exact $p90x")
    }
  }
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.{q, qRowsOnly}
import graft.domain.{Interception, Kinematics, Openness}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2.8 — the compute kernels (K1/K2), exercised over
  * kinematic columns derived deterministically from the events table
  * (the testdata has no tracking table; the kernels are generic).
  *
  * Scale notes: both kernels are per-row map work — no shuffle, no
  * driver involvement, embarrassingly parallel across partitions exactly
  * like the reference's future_lapply chunking (K3), which Spark
  * subsumes. K1 is closed-form (~360 flops/row vs 360 optimizer runs in
  * the reference). K2's per-row seeded RNG keeps results identical under
  * any partitioning — repartition-safe by construction.
  */
object KernelQueries {

  /** Deterministic kinematic columns derived from events: receiver speed
    * 5-10 yd/s, ball speed 15-25 yd/s (vb > vp always), positions on the
    * 120 × 53.3 field. */
  private def kin(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("vp", lit(5.0) + col("value") % 5)
    .withColumn("px", col("value") % 100 + 10)
    .withColumn("py", (col("user_id") % 40).cast("double") + 5)
    .withColumn("vb", lit(15.0) + col("value") % 10)
    .withColumn("bx", lit(60.0))
    .withColumn("by", lit(26.65))

  private val k1Udf = udf { (vp: Double, px: Double, py: Double,
                             vb: Double, bx: Double, by: Double) =>
    Interception.partialRadius(vp, px, py, vb, bx, by)
  }

  /** params = [vs, dir, px, py, vb, fx, fy] packed to stay within the
    * 10-argument Scala-UDF limit. */
  private val k2Udf = udf { (params: Seq[Double], dxs: Seq[Double],
                             dys: Seq[Double], dss: Seq[Double], seed: Long) =>
    val Seq(vs, dir0, px, py, vb, fx, fy) = params
    val defenders = dxs.indices.map(i => Openness.Defender(dxs(i), dys(i), dss(i)))
    Openness.openCount(vs, dir0, px, py, defenders, vb, fx, fy, seed)
  }

  val defs: Seq[QueryDef] = Seq(

    // K1 — interception radius, closed form. The oracle replays the same
    // quadratic-root formula as a DuckDB list comprehension over the 360
    // headings — the kernel is *independently* recomputed by a second
    // engine, not just re-run.
    q("k1_intercept_radius",
      """WITH k AS (
        |  SELECT event_id,
        |         5.0 + (value % 5)  AS vp,
        |         (value % 100) + 10 AS px,
        |         CAST(user_id % 40 AS DOUBLE) + 5 AS py,
        |         15.0 + (value % 10) AS vb,
        |         60.0 AS bx, 26.65 AS by
        |  FROM events WHERE event_id < 2000),
        |r AS (
        |  SELECT event_id,
        |         [ vp * ( vp*((px-bx)*cos(radians(d)) + (py-by)*sin(radians(d)))
        |               + sqrt( vp*vp * ((px-bx)*cos(radians(d)) + (py-by)*sin(radians(d)))
        |                             * ((px-bx)*cos(radians(d)) + (py-by)*sin(radians(d)))
        |                     + (vb*vb - vp*vp) * ((px-bx)*(px-bx) + (py-by)*(py-by)) )
        |               ) / (vb*vb - vp*vp)
        |           for d in range(0, 360) ] AS radii
        |  FROM k)
        |SELECT event_id,
        |       round(list_min(radii), 4) AS r_min,
        |       round(list_max(radii), 4) AS r_max,
        |       round(list_aggregate(radii, 'sum') / 360, 4) AS r_mean
        |FROM r ORDER BY event_id""".stripMargin) { (s, dir) =>
      kin(Tables.load(s, dir, "events").filter(col("event_id") < 2000))
        .withColumn("radii", k1Udf(col("vp"), col("px"), col("py"),
                                   col("vb"), col("bx"), col("by")))
        .select(col("event_id"),
          round(array_min(col("radii")), 4).as("r_min"),
          round(array_max(col("radii")), 4).as("r_max"),
          round(aggregate(col("radii"), lit(0.0), _ + _) / 360, 4).as("r_mean"))
        .orderBy("event_id")
    },

    // K2 — seeded Monte-Carlo openness. Three synthetic defenders per
    // row; the seed is the row key's xxhash64, so any partitioning of
    // the same input produces bit-identical scores (asserted in
    // OpennessSpec). RNG not SQL-expressible → rows-only.
    qRowsOnly("k2_openness") { (s, dir) =>
      kin(Tables.load(s, dir, "events").filter(col("event_id") < 1000))
        .withColumn("vs", lit(2.0) + col("value") % 3) // small reach box
        .withColumn("dir0", (col("value") % lit(6.28)))
        .withColumn("dxs", array(col("px") + 3, col("px") - 4, col("px") + 1))
        .withColumn("dys", array(col("py") + 2, col("py") - 1, col("py") - 5))
        .withColumn("dss", array(lit(6.0), lit(7.0), lit(8.0)))
        .withColumn("seed", xxhash64(col("event_id")))
        .withColumn("open_count",
          round(k2Udf(array(col("vs"), col("dir0"), col("px"), col("py"),
                            col("vb"), col("bx"), col("by")),
                      col("dxs"), col("dys"), col("dss"), col("seed")), 4))
        .select("event_id", "open_count")
        .orderBy("event_id")
    },

    // F2 — per-step Euclidean distance between consecutive positions
    // (distance_step — BuildingReadOrder.R:87, DefPosModel.ipynb:143-147)
    q("f2_step_distance",
      """SELECT event_id, user_id,
        |       round(sqrt((x - lx) * (x - lx) + (y - ly) * (y - ly)), 4) AS step
        |FROM (SELECT event_id, user_id,
        |             value % 100 AS x, (value * 7) % 50 AS y,
        |             lag(value % 100)  OVER w AS lx,
        |             lag((value * 7) % 50) OVER w AS ly
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |WHERE lx IS NOT NULL ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .withColumn("x", col("value") % 100)
        .withColumn("y", (col("value") * 7) % 50)
        .withColumn("lx", lag("x", 1).over(w))
        .withColumn("ly", lag("y", 1).over(w))
        .filter(col("lx").isNotNull)
        .select(col("event_id"), col("user_id"),
          round(sqrt((col("x") - col("lx")) * (col("x") - col("lx")) +
                     (col("y") - col("ly")) * (col("y") - col("ly"))), 4).as("step"))
        .orderBy("event_id")
    },
  )
}

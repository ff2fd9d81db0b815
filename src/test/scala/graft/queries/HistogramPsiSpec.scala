package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** a24/a25 invariants beyond the oracle hash. */
class HistogramPsiSpec extends SparkSpec {

  test("a24: bin counts per group sum to the group's row count, all 8 bins present") {
    val hist = graft.SparkEntry.queries("a24_histogram")(spark, sfDir)
    val ev = graft.Tables.load(spark, sfDir, "events")
      .groupBy("event_type").agg(count(lit(1)).as("total"))
    val sums = hist.groupBy("event_type")
      .agg(sum("n").as("binned"), count(lit(1)).as("nbins"),
           min("bin").as("lo"), max("bin").as("hi"))
      .join(ev, "event_type")
    assert(sums.filter(col("binned") =!= col("total") ||
                       col("nbins") =!= 8 ||
                       col("lo") =!= 0 || col("hi") =!= 7).count() == 0)
  }

  test("a25: PSI is nonnegative for every group (per-term (q-p)ln(q/p) >= 0)") {
    val psi = graft.SparkEntry.queries("a25_psi")(spark, sfDir)
    assert(psi.filter(col("psi") < 0).count() == 0)
    assert(psi.count() == 5) // one row per event_type
  }

  test("a25: identical ref/cur periods bin identically (the PSI-0 case)") {
    // feed where both halves are the same rows: every bin share matches,
    // so every (q-p) factor and every ln ratio in a25's formula is
    // exactly zero — PSI's floor case
    import spark.implicits._
    val rows = (1 to 200).map { i =>
      // ts on day 10 (ref) and day 20 (cur) with IDENTICAL values
      val v = (i % 37) * 1.5
      Seq((s"t${i % 3}", java.sql.Timestamp.valueOf(f"2024-01-10 00:00:${i % 60}%02d"), v),
          (s"t${i % 3}", java.sql.Timestamp.valueOf(f"2024-01-20 00:00:${i % 60}%02d"), v))
    }.flatten
    val df = rows.toDF("event_type", "ts", "value")
    val ref = df.filter(dayofmonth(col("ts")) <= 15)
    val cur = df.filter(dayofmonth(col("ts")) > 15)
    val stats = ref.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    def binsOf(d: org.apache.spark.sql.DataFrame) =
      d.join(stats, "event_type")
        .select(col("event_type"),
          least(greatest(floor((col("value") - col("lo")) /
                  (col("hi") - col("lo")) * 8).cast("long"), lit(0L)),
                lit(7L)).as("bin"))
        .groupBy("event_type", "bin").count()
    val diff = binsOf(ref).except(binsOf(cur))
    assert(diff.count() == 0, "identical halves must bin identically")
  }
}

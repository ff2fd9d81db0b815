package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  /** The naive single-task-per-group window formulation — correct at any
    * scale that fits one task; used here as the in-JVM oracle. */
  private def windowed(df: DataFrame, g: String, v: String, w: String): DataFrame = {
    val ord = Window.partitionBy(g).orderBy(v)
    df.withColumn("cw",
        sum(col(w).cast("decimal(18,6)"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw",
        sum(col(w).cast("decimal(18,6)")).over(Window.partitionBy(g)))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(g)
      .agg(min(col(v)).as("wmedian"))
  }

  private def check(df: DataFrame, g: String, v: String, w: String): Unit = {
    val got = WeightedMedian.weightedMedian(df, g, v, w)
      .orderBy(g).collect().toSeq
    val want = windowed(df, g, v, w).orderBy(g).collect().toSeq
    assert(got == want)
  }

  test("matches the window formulation on lineitem (sf0.001)") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    check(li, "l_returnflag", "l_extendedprice", "l_quantity")
  }

  test("exact half-total boundary: 2*cum == total picks that value") {
    // weights 1,1,2: cum at v=10 is 2, total 4, 2*2 == 4 → median is 10
    val df = Seq(("a", 5.0, 1.0), ("a", 10.0, 1.0), ("a", 20.0, 2.0))
      .toDF("g", "v", "w")
    val m = WeightedMedian.weightedMedian(df, "g", "v", "w").collect()
    assert(m.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("a", 10.0)))
  }

  test("ties collapse: duplicate values accumulate before the test") {
    // v=1 carries 3 of 5 total weight across three tied rows → median 1
    val df = Seq(("a", 1.0, 1.0), ("a", 1.0, 1.0), ("a", 1.0, 1.0),
                 ("a", 2.0, 1.0), ("a", 3.0, 1.0)).toDF("g", "v", "w")
    val m = WeightedMedian.weightedMedian(df, "g", "v", "w").collect()
    assert(m.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("a", 1.0)))
  }

  test("one dominant-weight row wins regardless of position") {
    val df = Seq(("a", 1.0, 1.0), ("a", 50.0, 100.0), ("a", 99.0, 1.0),
                 ("b", 7.0, 0.5)).toDF("g", "v", "w")
    val m = WeightedMedian.weightedMedian(df, "g", "v", "w")
      .orderBy("g").collect()
    assert(m.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 50.0), ("b", 7.0)))
  }

  test("skewed many-partition input agrees with the window oracle") {
    // 4 shuffle partitions in specs; 10k rows, 2 groups, fractional
    // weights — forces each group across several range partitions and
    // non-trivial broadcast offsets.
    val df = spark.range(10000).select(
      (col("id") % 2).cast("string").as("g"),
      (col("id") % 97).cast("double").as("v"),
      ((col("id") % 7) + lit(0.25)).cast("double").as("w"))
    check(df, "g", "v", "w")
  }

  test("weighted quantiles: q sweep matches the window formulation") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    for ((qn, qd) <- Seq((1, 10), (1, 4), (3, 4), (9, 10), (1, 1))) {
      val got = WeightedMedian
        .weightedQuantile(li, "l_returnflag", "l_extendedprice", "l_quantity",
          qn, qd, outName = "wq")
        .orderBy("l_returnflag").collect().toSeq
      val ord = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
      val want = li
        .withColumn("cw", sum(col("l_quantity").cast("decimal(18,6)"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tw", sum(col("l_quantity").cast("decimal(18,6)"))
          .over(Window.partitionBy("l_returnflag")))
        .filter(col("cw") * qd >= col("tw") * qn)
        .groupBy("l_returnflag")
        .agg(min(col("l_extendedprice")).as("wq"))
        .orderBy("l_returnflag").collect().toSeq
      assert(got == want, s"quantile mismatch at q=$qn/$qd")
    }
  }

  test("q = 1/1 returns the group maximum value") {
    val df = Seq(("a", 1.0, 1.0), ("a", 5.0, 2.0), ("a", 3.0, 1.0))
      .toDF("g", "v", "w")
    val m = WeightedMedian.weightedQuantile(df, "g", "v", "w", 1, 1).collect()
    assert(m.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("a", 5.0)))
  }

  test("high-cardinality group key trips the bounded-collect cap, not a silent collect") {
    // 10k distinct groups against a cap of 100: the executor-side
    // require must fail BEFORE subtotals reach the driver, with the
    // pointer to the window formulation in the message
    val df = spark.range(10000).select(
      col("id").cast("string").as("g"),
      col("id").cast("double").as("v"),
      lit(1.0).as("w"))
    val e = intercept[org.apache.spark.SparkException] {
      WeightedMedian.weightedQuantile(df, "g", "v", "w", 1, 2,
        maxGroupsPerPartition = 100).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("enum-scale group key"), s"unexpected failure: $msg")
  }

  test("the default cap leaves enum-scale group keys untouched") {
    assert(WeightedMedian.MaxGroupsPerPartition >= 1000)
    val df = Seq(("a", 1.0, 1.0), ("b", 2.0, 1.0)).toDF("g", "v", "w")
    assert(WeightedMedian.weightedMedian(df, "g", "v", "w").count() == 2)
  }

  test("null weights are ignored, zero weights are inert") {
    val df = Seq(("a", 1.0, Some(0.0)), ("a", 2.0, Some(3.0)),
                 ("a", 9.0, None), ("a", 3.0, Some(1.0))).toDF("g", "v", "w")
    val m = WeightedMedian.weightedMedian(df, "g", "v", "w").collect()
    assert(m.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("a", 2.0)))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WelfordCVSpec extends SparkSpec {

  test("single-pass CV equals stddev_samp/avg within float tolerance") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 7, i * 1.5 + (i % 13))).toDF("k", "v")
    val cvUdaf = udaf(WelfordCV)
    val joined = df.groupBy("k").agg(cvUdaf(col("v")).as("cv1"))
      .join(df.groupBy("k").agg((stddev_samp(col("v")) / avg("v")).as("cv2")), "k")
    val maxErr = joined.select(max(abs(col("cv1") - col("cv2")))).head.getDouble(0)
    assert(maxErr < 1e-12)
  }

  test("merge is associative across arbitrary splits") {
    val xs = (1 to 100).map(_.toDouble * 1.7)
    def fold(seq: Seq[Double]) = seq.foldLeft(WelfordCV.zero)(WelfordCV.reduce)
    val whole = WelfordCV.finish(fold(xs))
    val (a, b) = xs.splitAt(37)
    val merged = WelfordCV.finish(WelfordCV.merge(fold(a), fold(b)))
    assert(math.abs(whole - merged) < 1e-12)
    // zero is the identity
    assert(WelfordCV.merge(WelfordCV.zero, fold(xs)) == fold(xs))
  }

  test("degenerate inputs give NaN, not exceptions") {
    assert(WelfordCV.finish(WelfordCV.zero).isNaN)
    assert(WelfordCV.finish(WelfordCV.reduce(WelfordCV.zero, 5.0)).isNaN)
  }
}

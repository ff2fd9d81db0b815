package graft.ml

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class MLSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  test("StringIndexer alphabetAsc matches lexicographic rank") {
    val docs = Tables.load(spark, sfDir, "documents")
    val indexer = new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol("lang").setOutputCol("idx").setStringOrderType("alphabetAsc")
    val got = indexer.fit(docs).transform(docs)
      .select("lang", "idx").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val langs = got.keys.toSeq.sorted
    langs.zipWithIndex.foreach { case (l, i) => assert(got(l) == i.toDouble) }
  }

  test("LR learns a linearly separable derived label near-perfectly") {
    // label := sign of the first embedding coordinate — separable by
    // construction; guards the whole train/score path end to end
    val data = emb.withColumn("sep_label",
      when(element_at(col("embedding"), 1) > 0, 1.0).otherwise(0.0))
    val metrics = Pipelines.lrMetrics(data, "sep_label")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(metrics("accuracy") > 0.9, s"accuracy=${metrics("accuracy")}")
    assert(metrics("n_train") + metrics("n_test") == emb.count().toDouble)
  }

  test("lrMetrics is reproducible (fixed seed, fixed data)") {
    val a = Pipelines.lrMetrics(emb, "label").collect().map(_.toString).sorted
    val b = Pipelines.lrMetrics(emb, "label").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("RF confusion matrix covers the held-out set exactly once") {
    val conf = Pipelines.rfConfusion(emb)
    val total = conf.agg(sum("n")).head.getLong(0)
    val Array(_, test0) = Pipelines.withFeatures(emb)
      .withColumn("label", col("label").cast("double"))
      .randomSplit(Array(0.8, 0.2), seed = 42)
    assert(total == test0.count())
    // predictions and labels stay in the known class range
    val bad = conf.filter(col("label") < 0 || col("label") > 9 ||
                          col("prediction") < 0 || col("prediction") > 9).count()
    assert(bad == 0)
  }

  test("standard scaler output has ~zero mean and ~unit variance") {
    val z = Pipelines.firstScaledElement(Pipelines.withFeatures(emb))
    val r = z.agg(avg("scaled0"), stddev_samp(col("scaled0"))).head
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
  }
}

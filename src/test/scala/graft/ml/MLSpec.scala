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

  test("assembleZeroFilled maps nulls to 0 and keeps values verbatim") {
    import org.apache.spark.ml.functions.vector_to_array
    import spark.implicits._
    val df = Seq((1L, Some(2.5), 7.0), (2L, None, -1.0), (3L, Some(0.0), 4.0))
      .toDF("id", "v", "u")
    val got = Pipelines.assembleZeroFilled(df, Seq("v", "u"))
      .select(col("id"), vector_to_array(col("features")).as("f"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("f").toList).toMap
    assert(got(1) == List(2.5, 7.0))
    assert(got(2) == List(0.0, -1.0))
    assert(got(3) == List(0.0, 4.0))
  }

  test("assembleImputed fills nulls with the exact non-null mean") {
    import org.apache.spark.ml.functions.vector_to_array
    import spark.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(4.0)), (4L, Some(6.0)))
      .toDF("id", "v")
    val got = Pipelines.assembleImputed(df, Seq("v"))
      .select(col("id"), vector_to_array(col("features")).as("f"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("f").head).toMap
    assert(got(2) == 4.0) // mean of 2, 4, 6
    assert(got(1) == 2.0 && got(3) == 4.0 && got(4) == 6.0)
  }

  test("stratifiedSplit is disjoint, covering, and ~80% per class") {
    val (train, test) = Pipelines.stratifiedSplit(
      emb, "label", 0.8, seed = 42, idCols = Seq("vec_id"))
    val nTrain = train.count(); val nTest = test.count()
    assert(nTrain + nTest == emb.count())
    assert(train.join(test, Seq("vec_id")).count() == 0)
    // per-class train share is Bernoulli(0.8) per row — allow a wide
    // but meaningful band on ~50-row classes
    val shares = train.groupBy("label").count().withColumnRenamed("count", "nt")
      .join(emb.groupBy("label").count(), Seq("label"))
      .select((col("nt") / col("count")).as("share"))
      .collect().map(_.getDouble(0))
    shares.foreach(s => assert(s > 0.55 && s < 0.97, s"train share $s"))
  }

  test("stratifiedSplit is reproducible for a fixed seed") {
    val (t1, _) = Pipelines.stratifiedSplit(emb, "label", 0.8, 42, Seq("vec_id"))
    val (t2, _) = Pipelines.stratifiedSplit(emb, "label", 0.8, 42, Seq("vec_id"))
    assert(t1.select("vec_id").collect().map(_.getLong(0)).sorted
      .sameElements(t2.select("vec_id").collect().map(_.getLong(0)).sorted))
  }

  test("OneVsRest(GBT) beats-or-matches LR on the separable 3-bucket label") {
    val bucketed = emb.withColumn("bucket_label",
      when(element_at(col("embedding"), 1) < -0.05, 0.0)
        .when(element_at(col("embedding"), 1) > 0.05, 2.0)
        .otherwise(1.0))
    val gbt = Pipelines.ovrGbtMetrics(bucketed, "bucket_label")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lr = Pipelines.lrMetrics(bucketed, "bucket_label")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gbt("n_classes") == 3.0)
    assert(gbt("ovr_gbt_accuracy") >= 0.9, s"gbt=${gbt("ovr_gbt_accuracy")}")
    assert(gbt("ovr_gbt_accuracy") >= lr("accuracy") - 0.05,
      s"gbt=${gbt("ovr_gbt_accuracy")} lr=${lr("accuracy")}")
  }

  test("TF-IDF quality classifier recovers the heuristic label") {
    val docs = Tables.load(spark, sfDir, "documents")
    val scored = graft.ml.Pipelines.qualityClassifier(docs).cache()
    val agree = scored.filter(col("prediction") === col("label")).count()
    val total = scored.count()
    assert(total == docs.count(), "classifier must score every document")
    assert(agree.toDouble / total >= 0.85,
      s"classifier agreement ${agree.toDouble / total} too low")
    // both classes must actually occur — a constant predictor is no gate
    assert(scored.select("prediction").distinct().count() == 2)
  }

  test("PCA explained-variance spectrum is a decreasing sub-distribution") {
    val rows = Pipelines.pcaSpectrum(emb).collect()
    val spectrum = rows.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map(_._2.head.getDouble(1))
    assert(spectrum.length == 8)
    spectrum.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - 1e-12, s"variance spectrum not decreasing: $a < $b") }
    assert(spectrum.forall(v => v >= 0 && v <= 1))
    assert(spectrum.sum <= 1.0 + 1e-9)
    // 64 symmetric dims: top-8 should still capture a nontrivial share
    assert(spectrum.sum > 8.0 / 64 * 0.5, s"top-8 share ${spectrum.sum}")
    // sign normalization: each component's first |loading| > 1e-9 is
    // positive, and each component is (near-)unit-norm
    rows.groupBy(_.getLong(0)).values.foreach { comp =>
      val loads = comp.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(loads.find(math.abs(_) > 1e-9).forall(_ > 0),
        "component not sign-normalized")
      val nrm = math.sqrt(loads.map(v => v * v).sum)
      assert(math.abs(nrm - 1.0) < 1e-9, s"loading norm $nrm")
    }
  }

  test("m10_pca's exact covariance block ties to the float covariance PCA consumes") {
    // the oracle-gated registers are sums over 1e-6-quantized values;
    // this pins them to the ACTUAL double covariance of the PCA input —
    // the quantization bound for cov of ~unit values at micro precision
    // is well inside 1e-4, so a formula error (wrong denominator, raw
    // vs central moments, index off-by-one) cannot hide in it
    val block = graft.SparkEntry.queries("m10_pca")(spark, sfDir)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(6))).toMap
    assert(block.size == 16 * 17 / 2, s"expected 136 entries, got ${block.size}")
    val n = emb.count().toDouble
    for ((i, j) <- Seq((1, 1), (1, 2), (7, 7), (3, 16))) {
      val xy = emb.select(
        element_at(col("embedding"), i).cast("double").as("x"),
        element_at(col("embedding"), j).cast("double").as("y"))
      val r = xy.agg(sum(col("x") * col("y")), sum("x"), sum("y")).head
      val want = (r.getDouble(0) - r.getDouble(1) * r.getDouble(2) / n) / (n - 1)
      assert(math.abs(block((i, j)) - want) < 1e-4,
        s"cov($i,$j): quantized ${block((i, j))} vs float $want")
    }
  }
}

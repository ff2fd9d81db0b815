package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Invariants of the composed pretraining pipeline (x18/x19) that the
  * DuckDB oracle can't express directly as row equality. */
class PipelineQueriesSpec extends SparkSpec {

  private lazy val corpus = SparkEntry.queries("x18_pretrain_pipeline")(spark, sfDir).cache()
  private lazy val funnel = SparkEntry.queries("x19_pipeline_funnel")(spark, sfDir)
    .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("funnel counts are monotonically non-increasing through the stages") {
    val order = Seq("0_raw", "1_lang", "2_quality", "3_exact", "4_neardup", "5_decon")
    val docs = order.map(funnel(_)._1)
    val toks = order.map(funnel(_)._2)
    assert(docs == docs.sorted.reverse, s"doc funnel not monotone: $docs")
    assert(toks == toks.sorted.reverse, s"token funnel not monotone: $toks")
    assert(docs.last > 0, "pipeline dropped every document")
  }

  test("survivor count matches the funnel's terminal stage") {
    assert(corpus.count() == funnel("5_decon")._1)
  }

  test("survivors contain no exact duplicates and no residual near-dup pairs") {
    val ids = corpus.select("doc_id")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val survived = docs.join(ids, "doc_id")
    assert(survived.groupBy(md5(col("text").cast("binary"))).count()
      .filter(col("count") > 1).count() == 0, "exact duplicates survived")
    // greedy-by-id drop rule: any surviving pair (a, b), a < b, with
    // J >= 0.7 would have dropped b — so the survivor set is pair-free
    val residual = graft.operators.NearDupPairs.over(
      survived.select(col("doc_id"),
        graft.functions.TextFunctions.shingles(col("text"), 3).as("s")))
    assert(residual.count() == 0, "near-dup pair survived the pipeline")
  }

  test("pack ids are dense per source and respect the 512-token budget shape") {
    import org.apache.spark.sql.expressions.Window
    // pack_id sequence per source is non-decreasing in doc_id and starts at 0
    val w = Window.partitionBy("source").orderBy("doc_id")
    val bad = corpus
      .withColumn("prev", lag("pack_id", 1, 0).over(w))
      .filter(col("pack_id") < col("prev"))
    assert(bad.count() == 0, "pack_id not monotone within source")
    val firsts = corpus.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(firsts.filter(col("pack_id") =!= 0).count() == 0, "first pack per source must be 0")
    // cumulative-bin relaxation: a pack overflows by at most one document
    val packTotals = corpus.groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as("mx"))
    assert(packTotals.filter(col("tot") - col("mx") >= 512 * 2).count() == 0,
      "a pack exceeds the budget by more than the one-doc relaxation bound")
  }
}

package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the text-pipeline operators beyond the oracle match. */
class TextQueriesSpec extends SparkSpec {

  test("x8 packing: every bin fits the budget up to its own last doc") {
    // cumsum-bin packing guarantee: a bin's total minus its final doc
    // is strictly under the budget (the final doc may overflow it)
    val packed = graft.SparkEntry.queries("x8_token_packing")(spark, sfDir)
    val viol = packed
      .withColumn("last_doc", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source", "pack_id").orderBy(desc("doc_id"))))
      .groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("total"),
           max(when(col("last_doc") === 1, col("n_tokens"))).as("tail"))
      .filter(col("total") - col("tail") >= 512)
      .count()
    assert(viol == 0L)
  }

  test("x8 packing: bins are dense per source, starting at 0") {
    val packed = graft.SparkEntry.queries("x8_token_packing")(spark, sfDir)
    val perSource = packed.groupBy("source")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"),
           countDistinct("pack_id").as("n"))
      .collect()
    perSource.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("n") == r.getAs[Long]("hi") + 1,
        s"holes in pack ids for ${r}")
    }
  }

  test("x10 sampling is deterministic and close to the 10% target") {
    val a = graft.SparkEntry.queries("x10_hash_sample")(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = graft.SparkEntry.queries("x10_hash_sample")(spark, sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b)
    val total = graft.Tables.load(spark, sfDir, "documents").count()
    val frac = a.size.toDouble / total
    assert(frac > 0.02 && frac < 0.25, s"sample fraction $frac far off 10%")
  }
}

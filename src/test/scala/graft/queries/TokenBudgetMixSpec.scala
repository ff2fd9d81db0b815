package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** x33_token_budget_mix invariants beyond the oracle hash: the selection
  * respects every domain budget, is greedy-maximal (the next-ranked doc
  * would overflow), and is a quality-ordered prefix (no doc is skipped in
  * favour of a worse one). */
class TokenBudgetMixSpec extends SparkSpec {

  private lazy val sel = graft.SparkEntry.queries("x33_token_budget_mix")(spark, sfDir)
    .cache()

  private lazy val ranked = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), nTok.as("n_tokens"),
        (col("n_chars").cast("double") / nTok.cast("double")).as("quality"))
    val budgets = d.groupBy("source")
      .agg((lit(3) * sum("n_tokens").cast("double") / lit(10.0)).as("budget"))
    val w = Window.partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    d.join(budgets, "source")
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .cache()
  }

  test("every domain stays within its budget") {
    val bad = sel.join(ranked.select("source", "doc_id", "budget"),
        Seq("source", "doc_id"))
      .filter(col("cum_tokens") > col("budget"))
    assert(bad.count() == 0)
  }

  test("greedy-maximal: the first unselected rank would overflow the budget") {
    val lastSel = sel.groupBy("source").agg(max("rk").as("last_rk"))
    val nextDoc = ranked.join(lastSel, "source")
      .filter(col("rk") === col("last_rk") + 1)
    // every domain with a next-ranked doc: taking it would exceed budget
    val fits = nextDoc.filter(col("cum") <= col("budget"))
    assert(fits.count() == 0,
      "a document that fits the budget was left unselected")
  }

  test("selection is a rank prefix per domain (1..n contiguous)") {
    val gaps = sel.groupBy("source")
      .agg(min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(gaps.count() == 0)
  }

  test("every domain selects at least one doc and not all docs") {
    val perSource = ranked.groupBy("source").agg(count(lit(1)).as("total"))
    val j = sel.groupBy("source").agg(count(lit(1)).as("nsel"))
      .join(perSource, "source")
    assert(j.filter(col("nsel") < 1).count() == 0)
    // 30% token budget cannot admit every doc of a domain
    assert(j.filter(col("nsel") === col("total")).count() == 0)
  }
}

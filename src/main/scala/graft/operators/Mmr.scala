package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy Maximal Marginal Relevance selection: pick k items, each round
  * taking argmax of  rel(i) − λ · max_{s ∈ S} cos(i, s)  over the
  * unselected corpus — the diverse-subset op of data curation (choose
  * representative-but-not-redundant examples).
  *
  * Distributed shape: MMR is inherently sequential in k (each pick
  * changes the penalty), so the operator runs k rounds; every round is
  * ONE distributed TakeOrdered (parallel per-partition top-1, tiny
  * driver merge) over the corpus scan, with the ≤ k already-selected
  * vectors shipped as plan literals (they are the only driver state —
  * k · dim floats). Cost: k scans; k is small (a sample seed set, not a
  * ranking) by use-case. Ties break on id so the result is
  * deterministic under any partitioning.
  *
  * Scores are rounded to 6 dp BEFORE each argmax: MMR carries no
  * meaning below 1e-6, and the rounded trajectory is reproducible
  * across engines and FP summation orders (sub-round ties fall to the
  * id tie-break), which is what lets a SQL oracle replay the greedy
  * loop step for step (v7's recursive-CTE oracle).
  */
object Mmr {
  def select(corpus: DataFrame, relCol: Column, embCol: Column, idCol: Column,
             k: Int, lambda: Double,
             sim: (Column, Column) => Column): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(idCol.as("__id"), relCol.as("__rel"), embCol.as("__emb"))
    var picked = Vector.empty[(Long, Double, Seq[Float])]
    while (picked.size < k) {
      val penalty: Column =
        if (picked.isEmpty) lit(0.0)
        else picked.map { case (_, _, v) => sim(col("__emb"), typedLit(v)) }
          .reduce(greatest(_, _))
      val remaining = if (picked.isEmpty) base
        else base.filter(!col("__id").isin(picked.map(_._1): _*))
      val row = remaining
        .select(col("__id"), col("__rel"), col("__emb"),
          round(col("__rel") - lit(lambda) * penalty, 6).as("__score"))
        .orderBy(desc("__score"), col("__id"))
        .limit(1).head()
      picked = picked :+ ((row.getLong(0), row.getDouble(3), row.getSeq[Float](2)))
    }
    picked.zipWithIndex
      .map { case ((id, score, _), i) => (i + 1L, id, score) }
      .toDF("rnk", "vec_id", "mmr_score")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-containment similarity self-join: all ordered pairs (a, b) with
  * |S_a ∩ S_b| / |S_a| ≥ t — the ASYMMETRIC near-duplicate relation
  * (quotes, wrappers, boilerplate-plus-payload) that symmetric Jaccard
  * (d2/d3) cannot express: a short document fully quoted inside a long
  * one has high containment but low Jaccard.
  *
  * Candidate generation is the prefix-filter principle applied to
  * containment (the Ed-Join/PPJoin family): if |S_a ∩ S_b| ≥ ⌈t·|S_a|⌉,
  * then among ANY |S_a| − ⌈t·|S_a|⌉ + 1 elements of S_a at least one is
  * in S_b — so indexing only a's (1−t)-fraction rarest shingles (global
  * document-frequency order) against b's full set is lossless. The
  * threshold is kept as a ratio tNum/tDen so every filter and the verify
  * are EXACT integer comparisons (tDen·|∩| ≥ tNum·|S_a|); only the
  * reported score divides.
  *
  * 100 TB shape: the probe side explodes ≈ (1−t)·|S_a| + 1 shingles per
  * doc (rarest-first keeps hot boilerplate shingles out of the probe);
  * the index side is the full shingle list — the candidate join is the
  * only wide op, then an array_intersect verify per candidate, map-side
  * after two id-keyed joins. Position/length pruning on the index side
  * (the JOSIE refinement) is the documented next cut if index-side
  * volume ever dominates.
  */
object ContainmentJoin {

  /** df must carry (idCol, shCol: array<string> of DISTINCT shingles).
    * Output: a_id, b_id, containment (double), for ordered pairs a ≠ b
    * with containment ≥ tNum/tDen.
    */
  def selfJoin(df: DataFrame, idCol: String, shCol: String,
               tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, s"need 0 < t <= 1; got $tNum/$tDen")
    val base = df.select(col(idCol).as("sid"), col(shCol).as("sh"),
                         size(col(shCol)).cast("long").as("n"))
    val exploded = base.select(col("sid"), col("n"), explode(col("sh")).as("g"))
    // global shingle document-frequency → rarest-first canonical order
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    // prefix size = n - ceil(t*n) + 1, all in integers
    val prefix = exploded.join(freq, "g")
      .withColumn("rk", row_number().over(
        Window.partitionBy("sid").orderBy(col("df"), col("g"))))
      // integer ceil division (div, not `/`): the double route is exact
      // only below 2^53 and this bound must never shrink the prefix
      .filter(col("rk") <= col("n") -
        expr(s"($tNum * n + ${tDen - 1}) div $tDen") + 1)
      .select(col("sid").as("a_id"), col("g"))
    val index = exploded.select(col("sid").as("b_id"), col("g"))
    val cands = prefix.join(index, "g")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id").distinct()
    cands
      .join(base.select(col("sid").as("a_id"), col("sh").as("sa"),
                        col("n").as("na")), "a_id")
      .join(base.select(col("sid").as("b_id"), col("sh").as("sb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("inter") * tDen >= lit(tNum) * col("na"))
      .select(col("a_id"), col("b_id"),
              (col("inter").cast("double") / col("na").cast("double"))
                .as("containment"))
  }
}

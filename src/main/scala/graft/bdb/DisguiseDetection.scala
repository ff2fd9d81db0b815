package graft.bdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `cover_threshold.R:8-39` — the reference's downstream consumer of
  * `coverage_predictions.csv`: flag the plays where the defense
  * DISGUISED its coverage, i.e. the model put at most 0.8 probability
  * on the coverage actually played AND still mispredicted it.
  *
  * Faithful composition of the R script:
  *  - `data$sum <- rowSums(data[, 5:22])` (cover_threshold.R:12) — the
  *    per-row probability total, kept as `row_sum` (a sanity column:
  *    ≈ 1 for a calibrated softmax/forest vote);
  *  - column/name canonicalization (cover_threshold.R:17-21): R turns
  *    `prob_2-Man` into `prob_2.Man` and rewrites `[ -]` → `.` in both
  *    coverage name columns so the dynamic `paste("prob_", cov)` lookup
  *    lands — here the per-class columns are one map keyed by coverage
  *    name, so the same rewrite is applied to the map keys and both
  *    name columns, and the lookup is a plain `element_at`;
  *  - the dig loop (cover_threshold.R:25-37): dig = 0 when
  *    `prob_{actual} > .8` OR actual == predicted, else 1;
  *  - `sum(dig)` (cover_threshold.R:39) via [[disguisedCount]], and the
  *    per-play flag kept as `disguised` (`data$disguised <- dig`).
  *
  * Scale shape: map-only over the predictions frame — no shuffle, no
  * UDF (map rewrite, lookup and flag are all builtin expressions inside
  * whole-stage codegen); the count is one partial-aggregated scalar.
  * A coverage name missing from the trained-class map (impossible when
  * predictions cover the training frame, as in the reference) reads as
  * probability 0 — the play counts as disguised unless predicted right,
  * rather than erroring like the R column lookup would.
  */
object DisguiseDetection {

  /** `str_replace_all(x, "[ -]", ".")` (cover_threshold.R:17-21). */
  private def canon(c: Column): Column = regexp_replace(c, "[ -]", ".")

  /** Per-play disguise flags over [[CoveragePlayModel.predictions]]
    * output (gameId, playId, defensiveTeam, actual_coverage,
    * predicted_coverage, probs: map<coverage, probability>). */
  def apply(predictions: DataFrame): DataFrame =
    predictions
      .withColumn("probs", transform_keys(col("probs"), (k, _) => canon(k)))
      .withColumn("actual_coverage", canon(col("actual_coverage")))
      .withColumn("predicted_coverage", canon(col("predicted_coverage")))
      .withColumn("row_sum",
        aggregate(map_values(col("probs")), lit(0.0), (acc, v) => acc + v))
      .withColumn("prob_actual",
        coalesce(element_at(col("probs"), col("actual_coverage")), lit(0.0)))
      .withColumn("disguised",
        when(col("prob_actual") > 0.8 ||
             col("actual_coverage") === col("predicted_coverage"), 0)
          .otherwise(1))
      .drop("probs")

  /** `sum(dig)` (cover_threshold.R:39). */
  def disguisedCount(flagged: DataFrame): Long =
    flagged.agg(sum(col("disguised"))).head.getLong(0)
}

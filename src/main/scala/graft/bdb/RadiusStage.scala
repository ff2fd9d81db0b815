package graft.bdb

import graft.domain.Openness
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pipeline stage 3 (SURVEY.md §3.1.3) — `radius_model.R`.
  *
  * Scores every cleaned_player_data row with the K2 openness kernel and
  * adds `secondId` = dense_rank(frameId) − 1 within the play
  * (`radius_model.R:257-261`).
  *
  * Scale notes: the reference's 50k-row chunks on cores−1 worker
  * processes (`radius_model.R:210-255`, K3) vanish — the kernel UDF runs
  * partition-parallel in the executors. The RNG is seeded per row from
  * the keys (xxhash64), so scores are identical under ANY partitioning,
  * repartition, or speculative re-execution — stronger than the
  * reference's per-chunk seeding, which changes results when the chunk
  * boundaries move.
  */
object RadiusStage {

  private val openUdf = udf { (params: Seq[Double], dxs: Seq[Double],
                               dys: Seq[Double], dss: Seq[Double], seed: Long) =>
    val Seq(vs, dir0, px, py, vb, fx, fy) = params
    val defenders = dxs.indices.map(i => Openness.Defender(dxs(i), dys(i), dss(i)))
    Openness.openCount(vs, dir0, px, py, defenders, vb, fx, fy, seed)
  }

  def apply(cleaned: DataFrame): DataFrame = {
    val scored = cleaned
      .withColumn("dir_rad", radians(col("dir")))
      .withColumn("open_count", openUdf(
        array(col("s"), col("dir_rad"), col("x"), col("y"),
              col("throw_speed"), col("fx"), col("fy")),
        transform(col("defenders"), d => d.getField("x")),
        transform(col("defenders"), d => d.getField("y")),
        transform(col("defenders"), d => d.getField("s")),
        xxhash64(col("gameId"), col("playId"), col("frameId"), col("nflId"))))
      .drop("dir_rad")
    scored.withColumn("secondId",
      dense_rank().over(
        Window.partitionBy("gameId", "playId").orderBy("frameId")) - 1)
  }
}

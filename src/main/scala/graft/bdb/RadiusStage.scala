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
  * the keys, so scores are identical under ANY partitioning,
  * repartition, or speculative re-execution — stronger than the
  * reference's per-chunk seeding, which changes results when the chunk
  * boundaries move.
  *
  * Round 8: the per-row seed moved from `xxhash64(keys...)` (Spark's
  * internal binary hashing — no second engine can replay it) to
  * `mix64` of a *31-folded key (plain signed-long arithmetic, then the
  * SplitMix64 scramble `OracleU64.mix64Ctes` replays in DuckDB) — the
  * same portability move that made k2_openness oracle-checkable. That
  * flipped `bdb_radius_stage` from rows-only+golden to DuckDB
  * hash-checked: the oracle independently re-runs the ENTIRE MC kernel
  * over the fixture (every sample, every defender test).
  */
object RadiusStage {

  private val openUdf = udf { (params: Seq[Double], dxs: Seq[Double],
                               dys: Seq[Double], dss: Seq[Double], seed: Long) =>
    val Seq(vs, dir0, px, py, vb, fx, fy) = params
    val defenders = dxs.indices.map(i => Openness.Defender(dxs(i), dys(i), dss(i)))
    Openness.openCount(vs, dir0, px, py, defenders, vb, fx, fy, seed)
  }

  private val mix64Udf = udf { (x: Long) => Openness.mix64(x) }

  def apply(cleaned: DataFrame): DataFrame = {
    val scored = cleaned
      .withColumn("dir_rad", radians(col("dir")))
      .withColumn("open_count", openUdf(
        array(col("s"), col("dir_rad"), col("x"), col("y"),
              col("throw_speed"), col("fx"), col("fy")),
        transform(col("defenders"), d => d.getField("x")),
        transform(col("defenders"), d => d.getField("y")),
        transform(col("defenders"), d => d.getField("s")),
        mix64Udf(((col("gameId") * 31 + col("playId")) * 31
                   + col("frameId")) * 31 + col("nflId"))))
      .drop("dir_rad")
    scored.withColumn("secondId",
      dense_rank().over(
        Window.partitionBy("gameId", "playId").orderBy("frameId")) - 1)
  }
}

package graft.bdb

import graft.domain.{Kernels, Openness}
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
  *
  * Round 9: the oracle-parity move above had a silent cost — reading
  * the `coalesce(1)` parquet replica (1,450 rows, one file) handed the
  * ~12.7M-sample kernel to ~1 task (2.9 s → 22.1 s in the driver
  * bench; the DuckDB side hit the SAME ≤2-thread pathology and fixed
  * it with MATERIALIZED — BdbQueries radius oracle). The kernel
  * projection now routes through [[graft.domain.Kernels.spread]] on
  * the seed keys — exactly the reference's chunked parallel map
  * (`radius_model.R:210-255`, SURVEY §2.8 K3) — which is
  * hash-invariant because scores are seeded per row. KernelSpreadSpec
  * makes the single-partition regression a failing test.
  */
object RadiusStage {

  // Array[Double] parameters (round 14): Spark converts
  // array<double> to primitive arrays for this signature, so the
  // ~12.7M-sample loop never boxes a coordinate (the Seq form built a
  // Seq[Defender] of case objects per row and unboxed per access).
  // Same arithmetic in the same order — bit-identical scores.
  private val openUdf = udf { (params: Array[Double], dxs: Array[Double],
                               dys: Array[Double], dss: Array[Double], seed: Long) =>
    Openness.openCount(params(0), params(1), params(2), params(3),
      dxs, dys, dss, params(4), params(5), params(6), seed, reachTime = 1.0)
  }.withName(Kernels.K2Name)

  private val mix64Udf = udf { (x: Long) => Openness.mix64(x) }

  /** The kernel projection alone (pre-`secondId`) — public so
    * KernelSpreadSpec can assert its runtime partition spread. */
  def scored(cleaned: DataFrame): DataFrame = {
    Kernels.spread(cleaned,
        col("gameId"), col("playId"), col("frameId"), col("nflId"))
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
  }

  def apply(cleaned: DataFrame): DataFrame =
    scored(cleaned).withColumn("secondId",
      dense_rank().over(
        Window.partitionBy("gameId", "playId").orderBy("frameId")) - 1)
}

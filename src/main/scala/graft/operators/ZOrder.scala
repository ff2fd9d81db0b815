package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping.
  *
  * Sorting a table by one column gives perfect min/max file pruning on
  * that column and none on any other; interleaving the bits of two keys
  * orders rows along a space-filling curve, so each written file covers a
  * compact RECTANGLE in (a, b) space and a box predicate on EITHER or
  * BOTH columns prunes most files from their parquet footer stats alone.
  * The lake-layout primitive behind `OPTIMIZE ... ZORDER BY`.
  *
  * At 100 TB this is a one-shot range-shuffle on the z-value (uniform by
  * construction — the curve index is dense), then a local sort per file;
  * subsequent scans with selective box predicates read a near-minimal
  * file subset instead of the whole table.
  */
object ZOrder {

  /** Bit-interleave two non-negative ints < 2^bits: a's bit i → bit 2i,
    * b's bit i → bit 2i+1. Pure column expression (codegen-friendly). */
  def interleave(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(1).cast("long"), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1).cast("long"), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Min/max-normalize a numeric column to an integer bucket in
    * [0, 2^bits). Bounds are supplied by the caller (one tiny agg,
    * broadcast back — never a per-row subquery). */
  def bucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val buckets = (1 << bits) - 1
    least(lit(buckets),
      greatest(lit(0),
        floor((c.cast("double") - lo) / (hi - lo + lit(1e-9)) * (buckets + 1))
          .cast("int")))
  }

  /** Cluster `df` along the z-curve of (a, b) into `numFiles` files:
    * compute global bounds, bucket both keys, range-partition on the
    * z-value and sort within partitions. The z column is internal and
    * dropped from the output. */
  def cluster(df: DataFrame, a: String, b: String,
              bits: Int = 8, numFiles: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(a)).cast("double").as("alo"), max(col(a)).cast("double").as("ahi"),
      min(col(b)).cast("double").as("blo"), max(col(b)).cast("double").as("bhi"))
    val z = interleave(
      bucket(col(a), col("alo"), col("ahi"), bits),
      bucket(col(b), col("blo"), col("bhi"), bits), bits)
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "alo", "ahi", "blo", "bhi")
  }
}

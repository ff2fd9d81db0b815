package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a Bloom filter over the small side's
  * join key, broadcast it, and drop non-matching big-side rows MAP-SIDE,
  * before the join's shuffle ever sees them.
  *
  * This is the manual form of Spark's runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only fires
  * when the optimizer can prove a selective creation-side predicate); as a
  * library operator it applies whenever the caller KNOWS the dimension
  * side is selective — e.g. a curated id list, a quality-gated partition —
  * even when that knowledge is not visible to the optimizer.
  *
  * Correctness never depends on the filter: Bloom false positives pass
  * through and are removed by the exact semi join that follows; false
  * negatives are impossible. The filter only cuts shuffled volume — at
  * 100 TB with a 1% matching fraction, ~99% of the fact table never
  * leaves its input partition, at the cost of one ~`1.44·n·log2(1/fpp)`-bit
  * broadcast (≈9 bits/key at fpp=0.03).
  */
object BloomPrune {

  /** Exact semi join of `big` on `bigKey` against `small`'s `smallKey`,
    * with a Bloom pre-filter on the big side. Long-typed keys. */
  def semiJoin(big: DataFrame, bigKey: String,
               small: DataFrame, smallKey: String,
               expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big
      .filter(mightContain(col(bigKey))) // map-side: runs before any shuffle
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** The pruned-but-unjoined frame, for measuring the filter's cut rate
    * (spec/diagnostics only — production callers use semiJoin). */
  def pruneOnly(big: DataFrame, bigKey: String,
                small: DataFrame, smallKey: String,
                expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
  }
}

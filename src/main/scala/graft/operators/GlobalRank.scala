package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Scalable global rank: `row_number() OVER (ORDER BY ...)` without the
  * single-partition window (`Window.orderBy` with no partitionBy moves ALL
  * rows to one partition — the textbook scale killer; reference computes
  * global ranks via `arrange` + row position, QBReadStats.R:230-246).
  *
  * Two-phase shape: a range-partitioned parallel sort, then per-partition
  * offsets via `zipWithIndex` (one lightweight count job over the already
  * materialized sort shuffle, then a map). Shuffle files are reused across
  * the two jobs, so boundaries are consistent. Rank is dense and 1-based,
  * matching `row_number()` when the sort key is a total order — callers
  * must include a tie-break column.
  */
object GlobalRank {

  def withGlobalRank(df: DataFrame, rankCol: String, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }
}

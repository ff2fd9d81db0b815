package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Generic array/horizontal operators (SURVEY §2.6 R7-R9) built purely from
  * codegen'd higher-order functions — no UDFs, so they stay inside
  * whole-stage codegen and never leave the JVM row pipeline.
  */
object ArrayOps {

  /** Row-wise nearest-non-null fill (reference: QBReadStats.R:70-93).
    * result(i) = the non-null element whose index is closest to i; ties go
    * to the LOWER index (matching R's which.min). All-null input maps to
    * all-null output.
    */
  def nearestNonNullFill(arr: Column): Column =
    transform(
      sequence(lit(1), size(arr)),
      i => {
        val candidates = filter(
          transform(sequence(lit(1), size(arr)),
            j => struct(abs(j - i).as("d"), j.as("j"))),
          p => !isnull(element_at(arr, p.getField("j"))))
        // array_min on struct<d,j> is lexicographic: nearest distance,
        // then lowest index
        element_at(arr, array_min(candidates).getField("j"))
      })

  /** Index (1-based) of the minimum element; first occurrence on ties
    * (reference: max.col(-diffs) ties.method="first", QBReadStats.R:102). */
  def argMin(arr: Column): Column = array_position(arr, array_min(arr))

  /** Horizontal sum in double, folding left-to-right (reference:
    * rowSums, cover_threshold.R:11). */
  def rowSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x.cast("double"))
}

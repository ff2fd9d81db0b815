package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Exact per-group weighted median WITHOUT a low-cardinality-partition
  * cumulative window.
  *
  * The naive plan (`sum(w) OVER (PARTITION BY group ORDER BY value)`)
  * partitions the window by the GROUP key — for an enum-like key (a26's
  * `l_returnflag` has 3 values) that sorts the whole fact table on 3
  * tasks regardless of cluster size: the classic scale killer. (Reference
  * semantics: a weighted center like radius_model.R's weighted openness
  * aggregation, generalized to the median.)
  *
  * Scale-safe shape (the GlobalRank partial-offset pattern applied per
  * group, operators/GlobalRank.scala):
  *
  *  1. PRE-AGGREGATE by (group, value) — collapses ties and bounds the
  *     sorted table by the number of DISTINCT values, with ordinary
  *     partial-agg map-side combine on a high-cardinality key.
  *  2. RANGE-PARTITION + sort on (group, value) — the TeraSort shape.
  *     One group spans MANY partitions; no partition ever holds more
  *     than ~1/N of the data no matter how few groups exist.
  *  3. Per-(partition, group) weight SUBTOTALS — ≤ nParts × |groups|
  *     rows to the driver (bounded: groups are enum-scale by premise;
  *     for high-cardinality groups the naive window is already fine and
  *     this operator is unnecessary).
  *  4. Broadcast prefix offsets; ONE more map-only pass over the same
  *     sorted shuffle (shuffle files are reused across the two jobs)
  *     finds each group's flip point `2·cum(v) ≥ total`. The predicate
  *     is monotone in value order (weights ≥ 0), so each partition emits
  *     AT MOST ONE row per group and a tiny final min-agg resolves the
  *     global flip point.
  *
  * Weights accumulate as exact DECIMAL in deterministic in-partition
  * order, so the result is fold-order-free and hash-stable against a
  * single-threaded oracle. Precondition: weights ≥ 0 (negative weights
  * break the monotonicity the early-exit relies on).
  *
  * Equivalence with the row-level cumulative definition ("smallest value
  * whose running weight, in (value, tiebreak…) order, reaches half the
  * total"): collapsing ties makes cum(v) the running weight at the LAST
  * row of v's run, which crosses half-total iff some row inside the run
  * does — so the minimal qualifying value is identical.
  */
object WeightedMedian {

  /** Phases 1–2 as a frame (also dumped into EXPLAIN.md): the (group,
    * value) pre-aggregation and the range-partitioned sort the two scan
    * jobs run over. */
  def sortedFrame(df: DataFrame, groupCol: String, valueCol: String,
                  weightCol: String): DataFrame = {
    val nParts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.filter(col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("decimal(18,6)")).as("w"))
      .repartitionByRange(nParts, col(groupCol), col(valueCol))
      .sortWithinPartitions(col(groupCol), col(valueCol))
  }

  /** Enforced bound on the phase-3 subtotal collect: each partition may
    * contribute at most this many DISTINCT group keys, capping the
    * driver collect at nParts × MaxGroupsPerPartition rows. The
    * two-phase plan presumes an enum-scale group key (the a26/a27
    * shape); a high-cardinality group key trips this require instead of
    * silently collecting — and for such keys the ordinary cumulative
    * window (`sum(w) OVER (PARTITION BY group ORDER BY value)`) is
    * already scale-safe, because many groups means no
    * few-partitions sort. */
  val MaxGroupsPerPartition = 10000

  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String, medianName: String = "wmedian"): DataFrame =
    weightedQuantile(df, groupCol, valueCol, weightCol,
      qNum = 1, qDen = 2, outName = medianName)

  /** General exact weighted quantile: the smallest value whose cumulative
    * weight reaches q = qNum/qDen of the group total (median = 1/2).
    * The flip test is qDen·cum ≥ qNum·total — same integer-exact,
    * division-free comparison, same two-phase plan. */
  def weightedQuantile(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String, qNum: Int, qDen: Int,
                       outName: String = "wquantile",
                       maxGroupsPerPartition: Int = MaxGroupsPerPartition): DataFrame = {
    require(qNum > 0 && qDen > 0 && qNum <= qDen, s"need 0 < q <= 1; got $qNum/$qDen")
    val spark = df.sparkSession
    val medianName = outName
    val sorted = sortedFrame(df, groupCol, valueCol, weightCol)

    val schema = sorted.schema
    val gIdx = schema.fieldIndex(groupCol)
    val vIdx = schema.fieldIndex(valueCol)
    val wIdx = schema.fieldIndex("w")
    val rdd = sorted.rdd // one lineage, two jobs → sort shuffle reused

    // 3 — bounded subtotal collect: ≤ nParts × maxGroupsPerPartition
    // rows BY CONSTRUCTION — the enum-scale-groups premise is a
    // runtime require (executor-side, before anything reaches the
    // driver), not a scaladoc promise
    val subs: Array[(Int, Any, java.math.BigDecimal)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[Any, java.math.BigDecimal]
        it.foreach { r =>
          val g = r.get(gIdx)
          if (!m.contains(g) && m.size >= maxGroupsPerPartition)
            throw new IllegalArgumentException(
              s"weightedQuantile($groupCol): partition $pid holds more than " +
              s"$maxGroupsPerPartition distinct group keys — the two-phase " +
              "plan presumes an enum-scale group key. For a high-cardinality " +
              "group key use the ordinary cumulative window " +
              s"(sum($weightCol) OVER (PARTITION BY $groupCol ORDER BY " +
              s"$valueCol)), which is scale-safe when groups are numerous.")
          m.update(g, m.getOrElse(g, java.math.BigDecimal.ZERO).add(r.getDecimal(wIdx)))
        }
        m.iterator.map { case (g, s) => (pid, g, s) }
      }.collect()

    val byGroup = subs.groupBy(_._2)
    val totals: Map[Any, java.math.BigDecimal] = byGroup.map { case (g, rows) =>
      g -> rows.iterator.map(_._3).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    }
    val offsets: Map[(Int, Any), java.math.BigDecimal] = byGroup.flatMap {
      case (g, rows) =>
        var acc = java.math.BigDecimal.ZERO
        rows.sortBy(_._1).map { case (pid, _, w) =>
          val off = acc; acc = acc.add(w); ((pid, g), off)
        }
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)

    // 4 — seeded running weight; ≤ 1 emitted row per (partition, group)
    val den = java.math.BigDecimal.valueOf(qDen.toLong)
    val num = java.math.BigDecimal.valueOf(qNum.toLong)
    val hits = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bcOff.value; val tot = bcTot.value
      val run = scala.collection.mutable.HashMap.empty[Any, java.math.BigDecimal]
      val done = scala.collection.mutable.HashSet.empty[Any]
      it.flatMap { r =>
        val g = r.get(gIdx)
        if (done.contains(g)) None
        else {
          val cum = run.getOrElse(g, off((pid, g))).add(r.getDecimal(wIdx))
          run.update(g, cum)
          if (cum.multiply(den).compareTo(tot(g).multiply(num)) >= 0) {
            done.add(g); Some(Row(g, r.get(vIdx)))
          } else None
        }
      }
    }
    val outSchema = StructType(Seq(schema(gIdx), schema(vIdx).copy(name = medianName)))
    spark.createDataFrame(hits, outSchema)
      .groupBy(col(groupCol))
      .agg(min(col(medianName)).as(medianName))
  }
}

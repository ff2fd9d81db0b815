package graft

/** Every oracle-checked query must produce identical canonicalized rows
  * under different shuffle parallelism — the driver hash-compares
  * results against DuckDB, so any partial-aggregation-order drift,
  * unpinned tie-break, or partitioning-sensitive RNG fails the gate.
  * This spec shakes those out before the driver does. */
class DeterminismSpec extends IsolatedSparkSpec {

  private def canon(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq

  for (name <- SparkEntry.oracleSql.keys.toSeq.sorted) {
    test(s"$name is stable across shuffle parallelism 4 vs 7") {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val a = canon(name)
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = try canon(name)
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name differs across parallelism")
    }
  }
}

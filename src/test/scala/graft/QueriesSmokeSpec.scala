package graft

/** Every registered query must plan and execute on sf0.001, and the
  * flagship entry() must return rows — mirrors the driver's smoke gate.
  * Correctness-vs-oracle is the driver's DuckDB compare (tools/
  * verify_local.py); this suite guards against queries that throw. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or a rows-only marker") {
    val names = SparkEntry.queries.keySet
    assert(names.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes on sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Each query is materialized through the `noop` sink — every output column
  * is computed and serialized, unlike a bare `.count()` which lets Catalyst
  * prune unused projections (a pure-projection query would only time the
  * scan). Two JSON lines are printed: the full per-query map first, then a
  * COMPACT summary line LAST (total + slowest-10) so a tail-truncating
  * capture still gets a parsable line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: load every table once (parquet footers, codegen,
    // broadcast/shuffle thread pools) so per-query numbers measure the
    // query, not first-touch JVM effects (~3-4s on the first query)
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jmap(kvs: Iterable[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"per_query","value":$total,"unit":"sec","queries":${jmap(results)},"sf":"$sfDir"}""")
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(slowest)},"sf":"$sfDir"}""")
    spark.stop()
  }
}

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
    // optional comma-separated name filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=x18_pretrain_pipeline,s14_profile; driver leaves
    // it unset and benches everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None        => SparkEntry.queries
    }
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be distinguishable from a fast success: record
      // its name in "errors" and report value -1, never a small elapsed
      // strip the terminal oracle-determinism ORDER BY (GraftBenchPlan
      // scaladoc) so the timing covers the operator, not an output sort
      val ok =
        try {
          org.apache.spark.sql.GraftBenchPlan.withoutTerminalSort(fn(spark, sfDir))
            .write.format("noop").mode("overwrite").save()
          true
        }
        catch { case e: Throwable =>
          errors += name
          System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def jmap(kvs: Iterable[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def jlist(xs: Iterable[String]): String =
      xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val errs = s""""errors":${jlist(errors)}"""
    println(s"""{"metric":"per_query","value":$total,"unit":"sec","queries":${jmap(results)},$errs,"sf":"$sfDir"}""")
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(slowest)},$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

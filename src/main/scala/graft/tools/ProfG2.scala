package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev probe: g2 at sf3 under the protocol 32-partition pin vs the
  * engine's production posture (AQE + over-partition + advisory
  * coalesce) — evidence for the SCALING.md partition-count claim. */
object ProfG2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf3")
    def run(tag: String)(bld: SparkSession.Builder): Unit = {
      val s = bld.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      graft.Tables.names.foreach { n =>
        try graft.Tables.load(s, dir, n).count() catch { case _: Throwable => } }
      (1 to 2).foreach { i =>
        graft.Caches.reset(s)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries("g2_triangle_count")(s, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROF g2[$tag] run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      s.stop()
    }
    run("pin32")(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    run("pin256")(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false"))
    run("aqe256")(graft.Graft.configure(SparkSession.builder().master("local[32]"))
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false"))
  }
}

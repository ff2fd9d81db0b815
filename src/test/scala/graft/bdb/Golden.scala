package graft.bdb

import org.apache.spark.sql.DataFrame

/** Committed golden files for the BdbMini pipeline heads (SURVEY §5.3):
  * `bdb_radius_stage` and `bdb_press_pipeline` are rows-only in the
  * driver gate (the MC/openness kernels aren't SQL-expressible), so a
  * kernel regression would otherwise be silent row drift. The fixture
  * and every stage are deterministic (seeded generator, deterministic
  * orderings), so the rendered outputs are committed byte-for-byte and
  * PipelineSpec diffs against them.
  *
  * Doubles are rendered at 6 decimals: far below any real kernel change,
  * above float-sum reassociation noise.
  *
  * Regenerate (after an INTENDED kernel change — review the diff):
  *   sbt "Test/runMain graft.bdb.Golden"
  */
object Golden {

  val queries: Seq[String] = Seq("bdb_radius_stage", "bdb_press_pipeline")

  def resourcePath(name: String) = s"/goldens/$name.csv"

  def render(df: DataFrame): String = {
    val header = df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    val rows = df.collect().map { r =>
      r.toSeq.map {
        case null      => ""
        case d: Double => "%.6f".format(d)
        case f: Float  => "%.6f".format(f.toDouble)
        case v         => v.toString
      }.mkString(",")
    }
    (header +: rows).mkString("", "\n", "\n")
  }

  /** Writes the goldens into the source tree for committing. */
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("golden-gen")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val outDir = java.nio.file.Paths.get("src/test/resources/goldens")
      java.nio.file.Files.createDirectories(outDir)
      queries.foreach { name =>
        val df = graft.SparkEntry.queries(name)(spark, "unused")
        java.nio.file.Files.write(outDir.resolve(s"$name.csv"),
          render(df).getBytes("UTF-8"))
        println(s"wrote $name")
      }
    } finally spark.stop()
  }
}

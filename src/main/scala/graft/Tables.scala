package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver's synthetic parquet tables (TESTDATA.md).
  *
  * Design note (100 TB): all readers take the directory at call time and go
  * through `spark.read.parquet`, so Catalyst's data-source V2 path applies
  * column pruning + filter pushdown at the scan. Nothing here caches or
  * collects; at cluster scale these would be external tables with partition
  * columns, and every query below would partition-prune the same way.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's schema converter
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via the
    * legacy conf, then truncate to microseconds — exactly what DuckDB does
    * when it reads the same file, so oracle comparisons line up. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  /** Register every table as a temp view named exactly like the parquet
    * file, so `spark.sql` text matches the DuckDB oracle dialect's names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

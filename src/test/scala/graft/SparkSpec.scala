package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. One session per suite keeps the
  * JVM warm; local[4] with 4 shuffle partitions mirrors the driver's
  * verify configuration at miniature scale. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for other suites in the same JVM (Test/fork=true
    // gives one JVM per run, not per suite)
    super.afterAll()
  }
}

/** SparkSpec whose session has an ISOLATED SQLConf. sbt runs suites in
  * parallel threads inside the one forked JVM, and `getOrCreate` hands
  * every suite the SAME session — so a suite that mutates session conf
  * (shuffle.partitions, AQE thresholds, codegen flags) while another
  * suite is planning a query changes THAT suite's plans mid-flight.
  * That race is exactly how the bdb model goldens flaked: a concurrent
  * conf flip changed the RandomForest input's partition layout, which
  * changes MLlib's per-partition bootstrap streams. Every conf-mutating
  * suite must extend this trait: `newSession()` shares the
  * SparkContext (warm JVM preserved) but owns its SQLConf, so the
  * builder-level defaults still apply and nothing leaks across suites.
  */
trait IsolatedSparkSpec extends SparkSpec {
  override lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
    .newSession()
}

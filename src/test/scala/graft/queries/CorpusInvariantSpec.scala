package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executable form of the portable-hash family's data precondition
  * (TextFunctions.scala:161-165): the x5/d4 cross-engine fingerprints
  * hash characters as UTF-16 units (`charAt`) while the DuckDB oracle
  * hashes codepoints — the two agree exactly on BMP text and diverge on
  * supplementary-plane characters (surrogate pairs). The comment says
  * "the corpora are BMP-only"; this spec makes that claim fail loudly
  * the day a regenerated corpus includes emoji or other astral text,
  * instead of surfacing as an inscrutable oracle hash mismatch.
  */
class CorpusInvariantSpec extends SparkSpec {

  private val astral = "[\\x{10000}-\\x{10FFFF}]"

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"documents.text at $sf is BMP-only (portable-hash precondition)") {
      val n = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where(col("text").rlike(astral))
        .count()
      assert(n == 0,
        s"$n documents contain supplementary-plane characters; the " +
          "x5/d4 portable fingerprints are not oracle-portable on them")
    }
  }

  test("the astral guard itself detects supplementary-plane text") {
    import spark.implicits._
    val hit = Seq("plain text", "astral 😀 char").toDF("text")
      .where(col("text").rlike(astral)).count()
    assert(hit == 1)
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(lit(text).as("text")).select(c).head.get(0)

  test("tokens splits on single spaces") {
    assert(one("a bb ccc", size(tokens(col("text")))) == 3)
  }

  test("bpeIshTokenCount counts letter runs, digit runs, and symbols") {
    // "abc12!x" → abc, 12, !, x
    assert(one("abc12!x", bpeIshTokenCount(col("text"))) == 4)
  }

  private def seqOf(v: Any): List[String] =
    v.asInstanceOf[scala.collection.Seq[String]].toList

  test("shingles emits n-grams in order, distinct") {
    assert(seqOf(one("a b c d", shingles(col("text"), 3))) == List("a b c", "b c d"))
  }

  test("shingles of text shorter than n is the whole text") {
    assert(seqOf(one("a b", shingles(col("text"), 3))) == List("a b"))
  }

  test("shingles deduplicates repeated n-grams") {
    assert(seqOf(one("x y x y x y", shingles(col("text"), 2))) == List("x y", "y x"))
  }

  test("langId picks the profile with most marker hits; first-profile tie-break") {
    assert(one("the cat is on the mat", langId(col("text"))) == "en")
    assert(one("le chat et la souris", langId(col("text"))) == "fr")
    // no markers at all → all scores 0 → first profile wins (deterministic)
    assert(one("zzz qqq", langId(col("text"))) == "en")
  }

  test("stopwordRatio and meanTokenLen on a known sentence") {
    assert(one("the big dog", stopwordRatio(col("text"))) == 1.0 / 3)
    assert(one("a bb ccc", meanTokenLen(col("text"))) == 2.0)
  }

  test("rollingFingerprint is order-sensitive and deterministic") {
    // tokens chosen so per-token contributions (ascii + len) differ:
    // "alpha" → 102, "bb" → 100
    val ab = one("alpha bb", rollingFingerprint(col("text")))
    val ba = one("bb alpha", rollingFingerprint(col("text")))
    val ab2 = one("alpha bb", rollingFingerprint(col("text")))
    assert(ab == ab2)
    assert(ab != ba)
  }
}

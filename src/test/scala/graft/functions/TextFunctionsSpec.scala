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

  test("winnowing guarantee: shared run of >= w+n-1 tokens shares a fingerprint") {
    import spark.implicits._
    // two docs sharing a 6-token run (w=4, n=3 ⇒ guarantee at >= 6)
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $shared x1 y1"),
      (2L, s"p q r $shared other tokens here")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", explode(winnowing($"text", 3, 4)).as("f"))
    val common = fps.as("a").join(fps.as("b"),
      $"a.f" === $"b.f" && $"a.doc_id" < $"b.doc_id").count()
    assert(common >= 1)
  }

  test("winnowing finds every planted near-dup that exact Jaccard finds") {
    def pairs(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("d2_jaccard_pairs")
    val winnowed = pairs("x5_winnowing_pairs")
    assert(exact.nonEmpty)
    assert(exact.subsetOf(winnowed), s"missed: ${exact -- winnowed}")
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

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compiled per-row text fast paths (shingles, bigramPairs,
  * bigramStats, ngramHashes) replaced interpreted HOF formulations that
  * the DuckDB oracles were written against. These tests pin the compiled
  * forms to the HOF reference semantics (re-implemented in plain Scala
  * here) on adversarial inputs the corpus tables may never exercise:
  * empty strings, consecutive / leading / trailing spaces (split keeps
  * empties), non-ASCII, and texts shorter than the gram width
  * (whole-text shingle floor vs empty pair list).
  */
class CompiledTextFastPathSpec extends SparkSpec {

  private val adversarial = Seq(
    "", " ", "  ", "a", "a ", " a", "a  b", "é ß 漢 字",
    "one two", "one two three", "x x x x x x x x x x",
    "a b c d e f g",          // 7 tokens: below the 8-gram width
    "a b c d e f g h",        // exactly 8
    "a b c d e f g h i")      // 9
  private val rnd = new scala.util.Random(0xBDB2024)
  private val fuzz = Seq.fill(200) {
    val words = Seq.fill(rnd.nextInt(14))(
      Seq.fill(rnd.nextInt(4))(('a' + rnd.nextInt(4)).toChar).mkString)
    words.mkString(" ") + (if (rnd.nextBoolean()) " " else "")
  }
  private val texts = adversarial ++ fuzz

  private def df = {
    import spark.implicits._
    texts.toDF("text")
  }

  /** The HOF reference semantics, in plain Scala. */
  private def refShingles(t: String, n: Int): Seq[String] = {
    val ts = t.split(" ", -1).toSeq
    val m = math.max(ts.length - (n - 1), 1)
    (1 to m).map(i => ts.slice(i - 1, i - 1 + n).mkString(" ")).distinct
  }

  test("shingles ≡ HOF reference (distinct, order, short-text floor)") {
    val got = df.select(TextFunctions.shingles(col("text"), 3).as("r"))
      .collect().map(_.getSeq[String](0))
    got.zip(texts).foreach { case (g, t) =>
      assert(g == refShingles(t, 3), s"text=[$t]")
    }
  }

  test("bigramPairs: ordered pair slices, <2 tokens → empty") {
    val got = df.select(TextFunctions.bigramPairs(col("text")).as("r"))
      .collect().map(_.getSeq[String](0))
    got.zip(texts).foreach { case (g, t) =>
      val ts = t.split(" ", -1)
      val want =
        if (ts.length < 2) Seq.empty[String]
        else ts.sliding(2).map(_.mkString(" ")).toSeq
      assert(g == want, s"text=[$t]")
    }
  }

  test("bigramStats ≡ (count, distinct) of the floored bigram reference") {
    val got = df.select(TextFunctions.bigramStats(col("text")).as("bs"))
      .select("bs.nBigrams", "bs.nDistinct")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    got.zip(texts).foreach { case ((n, d), t) =>
      val ts = t.split(" ", -1).toSeq
      val bg =
        if (ts.length == 1) Seq(ts.head)
        else ts.sliding(2).map(_.mkString(" ")).toSeq
      assert(n == bg.length.toLong && d == bg.distinct.length.toLong, s"text=[$t]")
    }
  }

  test("ngramHashes: position law and gram-equality ⇒ hash-equality") {
    val got = df.select(TextFunctions.ngramHashes(col("text"), 8).as("r"))
      .collect().map(_.getSeq[Long](0))
    got.zip(texts).foreach { case (hs, t) =>
      val ts = t.split(" ", -1)
      if (ts.length < 8) assert(hs.isEmpty, s"text=[$t]")
      else {
        assert(hs.length == ts.length - 7, s"text=[$t]")
        val grams = ts.sliding(8).map(_.mkString(" ")).toSeq
        // the operator's correctness relies only on this direction;
        // collisions are ~m²/2⁶⁴ and the gate would catch one
        grams.zip(hs).groupBy(_._1).foreach { case (_, g) =>
          assert(g.map(_._2).distinct.size == 1, s"text=[$t]")
        }
      }
    }
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The tokenizer-standard ITERATIVE BPE encode: repeatedly merge the
  * lowest-rank adjacent symbol pair present in the word until no pair in
  * the table remains. This is x38's runtime twin for PRODUCTION
  * vocabulary sizes.
  *
  * Why two forms exist: x38's registered query applies the merge table
  * as a fixed chain of R `replace` expressions — provably the same
  * function (BpeQueries scaladoc), pure codegen'd string ops, and
  * DuckDB-replayable, which is what makes it oracle-checkable. But the
  * chain is O(R) PLAN NODES: at the 32k–100k merges a real tokenizer
  * ships, R expression nodes stop being plannable long before they stop
  * being slow (whole-stage codegen's 64KB method limit falls first).
  * This loop is the scale form: ONE plan node (a UDF), the merge table
  * riding as a broadcast rank map with O(1) lookups, cost proportional
  * to the merges that actually FIRE in a word — independent of table
  * size R. PropertySuites.BpeEncodeProps proves the two forms equal on
  * randomly trained tables; BpeTrainSpec pins the df-level twin to the
  * registered chain query's output bit-for-bit.
  *
  * The loop merges the chosen pair left-to-right non-overlapping within
  * a pass — exactly `mergeOnce` / `replace` semantics, so "b b b b"
  * becomes "bb bb", never "bb b b".
  */
object BpeEncode {

  /** Iterative encode of one word. `pairs` is the merge table in rank
    * order (rank = index); `rank` its lookup map. Pure function — the
    * unit under the ScalaCheck equivalence law. */
  def encode(word: String,
             pairs: IndexedSeq[(String, String)],
             rank: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    var continue = syms.length >= 2
    while (continue) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (l, rr) = pairs(best)
        val out = Array.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == rr) {
            out += (l + rr); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length >= 2
      }
    }
    syms
  }

  /** Column form: any string column → array&lt;string&gt; of tokens. The
    * merge table is broadcast ONCE per encode job (it is the model —
    * kilobytes to a few megabytes at production R) and every task probes
    * the same rank map. Takes the column to encode and the session
    * directly (round-11 ADVICE: the earlier DataFrame parameter was only
    * a SparkContext handle but hardcoded `col("word")`, inviting misuse
    * on frames without that column), and null-guards the UDF body: a
    * NULL word encodes to NULL, not an NPE. */
  def encodeUdf(spark: SparkSession, wordCol: Column,
                merges: Seq[(String, String)]): Column = {
    val bc = spark.sparkContext
      .broadcast((merges.toIndexedSeq, merges.zipWithIndex.toMap))
    udf((word: String) =>
      if (word == null) null
      else encode(word, bc.value._1, bc.value._2)).apply(wordCol)
  }

  /** The df-level twin of x38's encode stage: documents → (token,
    * n_tokens, n_docs) frequency head, same filter/aggregate contract as
    * the registered chain query, encode step swapped for the loop. */
  def encodeCorpusIter(docs: DataFrame,
                       merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1 && !col("word").rlike("[\\x00-\\x1f]"))
    words
      .select(col("doc_id"),
        explode(encodeUdf(docs.sparkSession, col("word"), merges)).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_tokens"),
           countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(desc("n_tokens"), col("token"))
      .limit(100)
  }
}

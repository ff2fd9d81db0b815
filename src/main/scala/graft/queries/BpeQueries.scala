package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** BPE merge-rule TRAINING as a distributed operator (x20 only counts
  * symbol pairs; this learns the actual merge table a byte-pair-encoding
  * tokenizer ships with).
  *
  * Algorithm (classic Sennrich et al. BPE, word-level):
  *   corpus → (word, freq) vocabulary table → repeat R times:
  *   count adjacent symbol pairs weighted by word freq → take the most
  *   frequent pair (ties broken lexicographically) → merge it greedily
  *   left-to-right in every word.
  *
  * Engine-portable encoding: a word's symbol sequence is one string with
  * every symbol wrapped as \u0001·sym·\u0002. Adjacent-pair patterns are
  * contiguous substrings, and — because each symbol carries its own
  * delimiters, never shared with a neighbour — plain non-overlapping
  * left-to-right `replace(enc, enc(A)+enc(B), enc(AB))`
  * IS the greedy BPE merge fold, with identical semantics in Spark and
  * DuckDB ("b b b b" merges to "bb bb", not "bb b b" — the shared-space
  * encoding gets that wrong, this one can't). Words containing control
  * chars are excluded by the same guard on both sides.
  *
  * 100 TB shape: this is how industrial BPE trainers scale — ONE pass over
  * the corpus builds the (word, freq) table (a single shuffle on word,
  * uniform keys), and all R merge rounds iterate over that vocabulary
  * table, which is orders of magnitude smaller than the corpus (Heaps'
  * law; x31 measures it). Pair counting is a codegen'd higher-order
  * transform + a tiny agg; only the single best (pattern, count) row ever
  * reaches the driver per round — the d5/IvfAnn bounded-collect pattern.
  * `localCheckpoint` truncates lineage across rounds exactly like d5's
  * label propagation.
  */
object BpeQueries {

  private val Rounds = 8
  private val S = "\u0001" // symbol-open delimiter
  private val E = "\u0002" // symbol-close delimiter

  /** DuckDB replay: the same rounds unrolled as CTEs (the d5 precedent). */
  private def oracle: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH w0 AS (
         |  SELECT CAST(count(*) AS BIGINT) AS freq,
         |         regexp_replace(word, '(.)', '$S\\1$E', 'g') AS enc
         |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
         |  WHERE length(word) >= 2 AND NOT regexp_matches(word, '[\\x00-\\x1f]')
         |  GROUP BY word),
         |""".stripMargin)
    for (r <- 1 to Rounds) {
      val prev = s"w${r - 1}"
      sb.append(
        s"""p$r AS (
           |  SELECT pat, CAST(sum(freq) AS BIGINT) AS cnt
           |  FROM (SELECT freq,
           |               unnest(['$S' || ss[i] || '$E$S' || ss[i+1] || '$E'
           |                       for i in range(1, len(ss))]) AS pat
           |        FROM (SELECT freq,
           |                     string_split(substring(enc, 2, length(enc) - 2),
           |                                  '$E$S') AS ss
           |              FROM $prev))
           |  GROUP BY pat),
           |b$r AS (SELECT pat, cnt FROM p$r ORDER BY cnt DESC, pat LIMIT 1),
           |w$r AS (
           |  SELECT freq,
           |         replace(enc, b.pat,
           |                 '$S' || replace(replace(b.pat, '$S', ''), '$E', '') || '$E') AS enc
           |  FROM $prev, b$r b),
           |""".stripMargin)
    }
    val rows = (1 to Rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
         |       string_split(substring(pat, 2, length(pat) - 2), '$E$S')[1] AS left_sym,
         |       string_split(substring(pat, 2, length(pat) - 2), '$E$S')[2] AS right_sym,
         |       cnt AS freq
         |FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    sb.append(s"merges AS (\n$rows)\n")
    sb.append("SELECT round, left_sym, right_sym, freq FROM merges ORDER BY round")
    sb.toString
  }

  val defs: Seq[QueryDef] = Seq(

    q("x34_bpe_train", oracle) { (s, dir) =>
      import s.implicits._
      val words0 = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 2 &&
                !col("word").rlike("[\\x00-\\x1f]"))
        .groupBy("word").agg(count(lit(1)).as("freq"))
        .withColumn("enc", regexp_replace(col("word"), "(.)", S + "$1" + E))
        .select("freq", "enc")
      var words = words0.localCheckpoint(eager = true)
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      var r = 1
      var exhausted = false
      while (r <= Rounds && !exhausted) {
        val withSyms = words.withColumn("ss",
          split(expr("substring(enc, 2, length(enc) - 2)"), s"$E$S"))
        val pairs = withSyms.select(col("freq"),
          explode(when(size(col("ss")) >= 2, expr(
            s"transform(sequence(1, size(ss) - 1), " +
            s"i -> concat('$S', element_at(ss, i), '$E$S', element_at(ss, i + 1), '$E'))"
          )).otherwise(expr("array()"))).as("pat"))
        // only the argmax row crosses to the driver (bounded collect)
        val best = pairs.groupBy("pat").agg(sum("freq").as("cnt"))
          .orderBy(desc("cnt"), col("pat")).limit(1).collect()
        if (best.isEmpty) exhausted = true
        else {
          val pat = best(0).getString(0)
          val cnt = best(0).getLong(1)
          val Array(l, rr) = pat.substring(1, pat.length - 1)
            .split(java.util.regex.Pattern.quote(E + S), -1)
          merges += ((r.toLong, l, rr, cnt))
          val mergedSym = S + l + rr + E
          words = words
            .withColumn("enc",
              call_function("replace", col("enc"), lit(pat), lit(mergedSym)))
            .select("freq", "enc")
            .localCheckpoint(eager = true)
          r += 1
        }
      }
      merges.result().toDF("round", "left_sym", "right_sym", "freq")
        .orderBy("round")
    },
  )
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID, and document
  * fingerprinting. All pure column expressions (no UDFs) — they run inside
  * whole-stage codegen and scale linearly with no shuffle.
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: runs of letters, runs of digits, or any single
    * non-space symbol. */
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0)))

  /** Distinct word n-gram shingles (space-joined), the dedup unit.
    * Floor of 1, not 0: Spark `sequence(1, 0)` DESCENDS to [1, 0], which
    * would emit a bogus slice-at-0; texts shorter than n yield one
    * whole-text shingle instead. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    array_distinct(
      transform(sequence(lit(1), greatest(size(ts) - (n - 1), lit(1))),
        i => array_join(slice(ts, i, lit(n)), " ")))
  }

  /** Small per-language marker-word profiles (public common stopwords). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "es" -> Seq("el", "los", "y", "las", "que", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "den", "ist", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他"))

  /** N-gram/marker-word language ID: hit count per profile, argmax with
    * first-profile tie-break (deterministic). */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scores = array(langProfiles.map { case (_, words) =>
      size(filter(ts, t => t.isin(words.map(lit(_)): _*)))
    }: _*)
    val codes = array(langProfiles.map(p => lit(p._1)): _*)
    element_at(codes, array_position(scores, array_max(scores)).cast("int"))
  }

  /** English stopword ratio (quality signal). */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = langProfiles.head._2
    size(filter(ts, t => t.isin(stops.map(lit(_)): _*))).cast("double") /
      greatest(size(ts), lit(1))
  }

  /** Mean token length (quality signal). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    aggregate(ts, lit(0), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(ts), lit(1))
  }

  /** Order-sensitive rolling polynomial fingerprint over tokens:
    * h = fold(tokens, 0) { (h, t) => (h*31 + ascii(t[0]) + len(t)) mod p }.
    * Stays in Long range (acc < p ⇒ acc*31 + x << 2^63), reproducible in
    * any engine — used for cheap shard-stable doc identity.
    */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + ascii(t) + length(t)) % p)
  }
}

package graft.queries

import graft.SparkSpec

/** x34_bpe_train invariants beyond the DuckDB round-replay: BPE's
  * structural properties on the learned merge table. */
class BpeTrainSpec extends SparkSpec {

  private lazy val merges: Seq[(Long, String, String, Long)] =
    graft.SparkEntry.queries("x34_bpe_train")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
                           r.getLong(3))).toSeq

  test("learns the full budget of rounds, numbered 1..R") {
    assert(merges.map(_._1) == (1L to merges.length).toSeq)
    assert(merges.length == 8)
  }

  test("merge frequencies are non-increasing across rounds") {
    // merging the argmax pair can only create pairs at most as frequent
    // (a new (X, AB) occurs at most as often as (A, B) did) and only
    // shrink existing counts — so the greedy maximum never rises
    val freqs = merges.map(_._4)
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b }, freqs)
  }

  test("every merged symbol derives from single chars or earlier merges") {
    val known = scala.collection.mutable.Set[String]()
    merges.foreach { case (r, l, rt, _) =>
      for (s <- Seq(l, rt))
        assert(s.length == 1 || known.contains(s),
          s"round $r uses symbol '$s' that is neither a char nor a prior merge")
      known += (l + rt)
    }
  }

  test("deterministic: a second run reproduces the merge table exactly") {
    val again = graft.SparkEntry.queries("x34_bpe_train")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
                           r.getLong(3))).toSeq
    assert(again == merges)
  }

  test("iterative UDF twin reproduces x38's chain encode bit-for-bit") {
    // the scale form for production vocabulary sizes (x38's R-bound
    // note): one UDF node looping lowest-rank-first over the broadcast
    // rank map must land the exact token-frequency head the registered
    // O(R)-plan-node replace chain computes — end-to-end over the same
    // corpus and the same trained table, not just on the ScalaCheck
    // word model
    val chain = graft.SparkEntry.queries("x38_bpe_encode")(spark, sfDir)
      .collect().map(_.toString).toSeq
    val table = merges.map { case (_, l, r, _) => (l, r) }
    val udf = graft.functions.BpeEncode
      .encodeCorpusIter(graft.Tables.load(spark, sfDir, "documents"), table)
      .collect().map(_.toString).toSeq
    assert(udf == chain)
  }

  test("encodeUdf takes any column and null-guards (round-11 ADVICE)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val table = merges.map { case (_, l, r, _) => (l, r) }
    val df = Seq(Some("abc"), None).toDF("s") // NOT named "word"
    val out = df.select(
      graft.functions.BpeEncode.encodeUdf(spark, col("s"), table).as("toks"))
      .collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getSeq[String](0).nonEmpty))
    assert(out.exists(_.isNullAt(0)), "NULL input must encode to NULL, not NPE")
  }
}

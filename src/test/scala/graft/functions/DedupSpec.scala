package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions.shingles
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import Dedup._

  private def pair(a: Seq[String], b: Seq[String]): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(jaccard(col("a"), col("b"))).head.getDouble(0)
  }

  test("jaccard: identical=1, disjoint=0, half-overlap") {
    assert(pair(Seq("x", "y"), Seq("x", "y")) == 1.0)
    assert(pair(Seq("x"), Seq("y")) == 0.0)
    assert(pair(Seq("x", "y"), Seq("y", "z")) == 1.0 / 3)
  }

  test("hamming: 0 for equal, counts differing bits") {
    import spark.implicits._
    val df = Seq((5L, 5L, 6L)).toDF("a", "b", "c")
    val r = df.select(hamming(col("a"), col("b")), hamming(col("a"), col("c"))).head
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 2) // 101 vs 110
  }

  test("minhash signature has k slots and is deterministic on equal input") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a b", "b c", "c d")), Tuple1(Seq("a b", "b c", "c d")))
      .toDF("s")
    val sigs = df.select(minhashFromHashes(shingleHashes(col("s")), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 16)
    assert(sigs(0) == sigs(1))
  }

  test("minhash signature agreement tracks jaccard similarity") {
    import spark.implicits._
    // near-identical sets should agree on most slots; disjoint on ~none
    val near = Seq(
      Tuple1((1 to 50).map("tok" + _)),
      Tuple1((1 to 48).map("tok" + _)))
    val far = Seq(Tuple1((1 to 50).map("a" + _)), Tuple1((1 to 50).map("b" + _)))
    def agree(rows: Seq[Tuple1[Seq[String]]]): Int = {
      val sigs = rows.toDF("s")
        .select(minhashFromHashes(shingleHashes(col("s")), 64).as("sig"))
        .collect().map(_.getSeq[Long](0))
      sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    }
    assert(agree(near) > 48) // E[agree] = 64 * J ≈ 64*0.96
    assert(agree(far) < 16)
  }

  test("simhash of near-identical token lists is close in hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1, (1 to 60).map("tok" + _)),
      (2, (1 to 58).map("tok" + _) ++ Seq("x1", "x2")),
      (3, (1 to 60).map("other" + _))).toDF("id", "toks")
    val sigs = df.select(col("id"), simhash(col("toks")).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hd(sigs(1), sigs(2)) < hd(sigs(1), sigs(3)))
    assert(hd(sigs(1), sigs(2)) <= 8)
  }

  test("portable simhash keeps SimHash locality (near docs close, far docs far)") {
    import spark.implicits._
    val df = Seq(
      (1, (1 to 60).map("tok" + _)),
      (2, (1 to 58).map("tok" + _) ++ Seq("x1", "x2")),
      (3, (1 to 60).map("other" + _))).toDF("id", "toks")
    val sigs = df.select(col("id"), simhashPortableFast(col("toks")).as("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hd(sigs(1), sigs(2)) < hd(sigs(1), sigs(3)))
    assert(hd(sigs(1), sigs(2)) <= 8)
    // 60-bit domain: bit 60+ never set
    assert(sigs.values.forall(s => (s >>> 60) == 0L))
  }

  test("simhashChunks covers all pairs within hamming <= chunks-1 (pigeonhole)") {
    import spark.implicits._
    // two signatures differing in exactly 3 bits MUST share >= 1 of 4 chunks
    val a = 0x0F0F0F0F0F0F0F0FL
    val b = a ^ 0x0000000000010101L // 3 bits flipped
    val df = Seq(("a", a), ("b", b)).toDF("id", "sig")
    val ch = df.select(col("id"), explode(simhashChunks(col("sig"), 4)).as("c"))
      .select(col("id"), col("c.chunk_idx"), col("c.chunk_val"))
    val shared = ch.as("x").join(ch.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk_val") === col("y.chunk_val") &&
        col("x.id") < col("y.id")).count()
    assert(shared >= 1)
  }

  test("LSH candidate generation finds every planted near-dup at sf0.001") {
    // ground truth: exact inverted-index jaccard >= 0.7 on the documents
    // table; the LSH query (d3) must return the identical pair set as the
    // exact query (d2)
    val d2 = graft.SparkEntry.queries("d2_jaccard_pairs")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d3 = graft.SparkEntry.queries("d3_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(d2.nonEmpty)
    assert(d3 == d2)
  }

  test("d7 spans are well-formed, maximal, and disjoint per doc") {
    val spans = graft.SparkEntry.queries("d7_dup_ngram_spans")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty)
    spans.foreach { case (_, s, e, n) =>
      assert(e - s >= 7, s"span shorter than one shingle: [$s,$e]")
      // contiguity bound: at most one shingle per position in the span
      assert(n >= 1 && n <= e - s - 6, s"shingle count $n outside [$s,$e]")
    }
    // maximality: consecutive spans of a doc are separated by at least
    // one non-duplicated token (else the islands would have merged)
    spans.groupBy(_._1).values.foreach { ds =>
      ds.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"adjacent spans not merged: $e1 -> $s2")
        case _ =>
      }
    }
  }

  test("d7 covers exact-duplicate docs end to end with a single span") {
    import org.apache.spark.sql.functions._
    // every doc whose full text occurs >= 2x in the corpus has ALL its
    // shingles duplicated, so its whole token range must be one span.
    // only sf0.1 contains exact duplicates — run this one there.
    val dir = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"),
              md5(col("text").cast("binary")).as("dg"))
    val dupDocs = docs.join(
        docs.groupBy("dg").count().filter(col("count") >= 2).select("dg"), "dg")
      .filter(col("n_tok") >= 8)
      .select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dupDocs.nonEmpty, "corpus has no exact duplicates to test against")
    val spans = graft.SparkEntry.queries("d7_dup_ngram_spans")(spark, dir)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getLong(1), r.getLong(2))).toSeq).toMap
    dupDocs.foreach { case (id, nTok) =>
      assert(spans.get(id).exists(_.contains((0L, nTok - 1))),
        s"exact-dup doc $id not fully covered: ${spans.get(id)}")
    }
  }

  test("d8 incremental LSH equals the full rebuild restricted to the delta") {
    // the maintenance guarantee: probing the standing index with only
    // the delta's band keys finds exactly the full-recompute pairs that
    // touch the delta — nothing missed, nothing extra
    def pairs(name: String) =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val incremental = pairs("d8_incremental_lsh")
    val fullTouchingDelta = pairs("d3_minhash_lsh")
      .filter { case (a, b) => a % 17 == 0 || b % 17 == 0 }
    assert(incremental == fullTouchingDelta,
      s"missed: ${fullTouchingDelta -- incremental}; extra: ${incremental -- fullTouchingDelta}")
    assert(incremental.nonEmpty, "delta produced no near-dup pairs to check")
  }

  test("d9 removes exactly the token positions d7's spans cover") {
    import org.apache.spark.sql.functions._
    // d7 islands merge on gaps <= 8, so each span [start, end] is a
    // fully-covered contiguous run: per-doc removed = sum of span sizes
    val spanCover = graft.SparkEntry.queries("d7_dup_ngram_spans")(spark, sfDir)
      .groupBy("doc_id")
      .agg(sum(col("span_end") - col("span_start") + 1).as("covered"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = graft.SparkEntry.queries("d9_dedup_apply")(spark, sfDir)
      .select("doc_id", "n_kept_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet == docs.keySet, "d9 must emit every document")
    kept.foreach { case (id, nk) =>
      val removed = docs(id) - nk
      assert(removed == spanCover.getOrElse(id, 0L),
        s"doc $id: removed $removed != span cover ${spanCover.getOrElse(id, 0L)}")
    }
    assert(spanCover.nonEmpty, "no spans at this SF — invariant vacuous")
  }

  test("d12 minhash estimates sit in the k=64 binomial envelope of exact J") {
    // the oracle gate checks VALUES; this checks the statistical
    // CONTRACT — each pair's matching-coordinate count is a Binomial
    // (64, J) draw, so |est − J| ≤ 4·σ with σ = √(J(1−J)/64), and the
    // published err_bp must be the exact integer recomputation.
    val rows = graft.SparkEntry.queries("d12_minhash_estimate")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("j_exact")
      val n = r.getAs[Long]("n_match")
      val estBp = r.getAs[Long]("j_est_bp")
      assert(n >= 0 && n <= 64, s"n_match $n outside [0, 64]")
      assert(estBp == n * 10000L / 64)
      val sigma = math.sqrt(j * (1 - j) / 64)
      assert(math.abs(estBp / 10000.0 - j) <= math.max(4 * sigma, 1.0 / 64),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): est $estBp bp vs exact $j " +
          s"outside 4σ (σ=$sigma)")
    }
  }
}

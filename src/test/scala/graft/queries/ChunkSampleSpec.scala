package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the round-10 corpus-prep operators — the
  * laws the oracle's value-hash can't state directly: x39's chunking
  * must COVER every document reconstructibly (no token lost at any
  * boundary), and x40's carve-out must hit its quota EXACTLY per
  * stratum while staying a subset of the population. */
class ChunkSampleSpec extends SparkSpec {

  private val W = 64
  private val S = 48

  test("x39: stride-prefix concatenation reconstructs every document") {
    // chunks overlap by W−S tokens, so doc text = concat of each
    // non-final chunk's first S tokens + the final chunk whole. Any
    // off-by-one in the slice arithmetic breaks this on some length.
    val chunks = graft.SparkEntry.queries("x39_chunk_overlap")(spark, sfDir)
      .collect().groupBy(_.getLong(0)).map { case (id, rows) =>
        val sorted = rows.sortBy(_.getLong(1))
        val parts = sorted.init.map(
          _.getString(3).split(" ", -1).take(S).mkString(" ")) :+
          sorted.last.getString(3)
        id -> parts.mkString(" ")
      }
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, rebuilt) =>
      assert(rebuilt == docs(id), s"doc $id not reconstructible from chunks")
    }
    assert(chunks.keySet == docs.keySet, "every doc must produce chunks")
  }

  test("x39: chunk lengths and counts follow the exact boundary formula") {
    val rows = graft.SparkEntry.queries("x39_chunk_overlap")(spark, sfDir)
      .collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nTok = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, cs) =>
      val n = nTok(id)
      val expected = if (n <= W) 1L else (n - W + S - 1) / S + 1
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks != $expected")
      cs.foreach { r =>
        val idx = r.getLong(1)
        assert(r.getLong(2) == math.min(W.toLong, n - idx * S),
          s"doc $id chunk $idx length")
      }
    }
  }

  test("x40: quota is exact per stratum and the sample is a sub-population") {
    val sample = graft.SparkEntry.queries("x40_stratified_sample")(spark, sfDir)
      .collect()
    val pop = graft.Tables.load(spark, sfDir, "documents")
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val popBySource = pop.groupBy(_._1)
    val bySource = sample.groupBy(_.getString(0))
    assert(bySource.keySet == popBySource.keySet,
      "every stratum must be represented")
    bySource.foreach { case (src, rows) =>
      val n = popBySource(src).length.toLong
      assert(rows.length.toLong == (n + 4) / 5,
        s"source $src: ${rows.length} sampled != ceil($n/5)")
      val ids = rows.map(_.getLong(1)).toSet
      assert(ids.subsetOf(popBySource(src).map(_._2).toSet),
        s"source $src: sampled ids outside the population")
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq,
        s"source $src: ranks must be the contiguous prefix 1..k")
    }
  }
}

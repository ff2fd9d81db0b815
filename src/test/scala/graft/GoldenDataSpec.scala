package graft

import graft.bdb.Golden

/** Byte-for-byte goldens for the seeded-but-deterministic DATA queries
  * (ML metrics, stratified split counts, MC-openness head) — rows-only in
  * the driver gate, so without these a numeric regression would be silent
  * row drift. Counterpart of PipelineSpec's bdb goldens; regenerate ONLY
  * for an intended change: sbt "Test/runMain graft.bdb.Golden".
  */
class GoldenDataSpec extends SparkSpec {

  test("seeded data-query heads match the committed goldens byte-for-byte") {
    val all = Golden.dataQueries.map(n => n ->
        ((s: org.apache.spark.sql.SparkSession) =>
          SparkEntry.queries(n)(s, Golden.dataSfDir))) ++ Golden.extraData
    all.foreach { case (name, fn) =>
      val got = Golden.render(fn(spark))
      val want = {
        val in = getClass.getResourceAsStream(Golden.resourcePath(name))
        assert(in != null, s"missing committed golden for $name")
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }
      assert(got == want, {
        val g = got.linesIterator.toSeq; val w = want.linesIterator.toSeq
        val firstDiff = g.zipAll(w, "<eof>", "<eof>").indexWhere(p => p._1 != p._2)
        s"$name diverged from golden at line $firstDiff: " +
          s"got=${g.lift(firstDiff)} want=${w.lift(firstDiff)}"
      })
    }
  }
}

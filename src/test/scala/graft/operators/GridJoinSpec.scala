package graft.operators

import graft.SparkSpec

class GridJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Double)], d: Double): Set[(Long, Long)] =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts if ia < ib
      if (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= d * d
    } yield (ia, ib)).toSet

  private def run(pts: Seq[(Long, Double, Double)], d: Double): Set[(Long, Long)] =
    GridJoin.selfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("grid join is lossless vs brute force on random points") {
    val rnd = new scala.util.Random(13)
    val pts = (0L until 400L).map(i =>
      (i, rnd.nextDouble() * 40, rnd.nextDouble() * 20))
    for (d <- Seq(0.5, 2.0, 7.0))
      assert(run(pts, d) == brute(pts, d), s"mismatch at d=$d")
  }

  test("boundary pairs: dist exactly d is IN, just beyond is OUT") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 2.0, 0.0),   // dist == d exactly
                  (3L, 10.0, 0.0), (4L, 12.0 + 1e-9, 0.0)) // just beyond
    val got = run(pts, 2.0)
    assert(got.contains((1L, 2L)))
    assert(!got.contains((3L, 4L)))
  }

  test("cell-edge pairs straddling grid lines are found (neighborhood probe)") {
    // points in adjacent cells, distance < d: the 3x3 probe must pair them
    val pts = Seq((1L, 1.999, 1.999), (2L, 2.001, 2.001),
                  (3L, 0.001, 3.999), (4L, 0.002, 4.001))
    val got = run(pts, 2.0)
    assert(got.contains((1L, 2L)))
    assert(got.contains((3L, 4L)))
  }

  test("each qualifying pair is emitted exactly once (no distinct needed)") {
    val rnd = new scala.util.Random(29)
    val pts = (0L until 200L).map(i =>
      (i, rnd.nextDouble() * 10, rnd.nextDouble() * 10))
    val rows = GridJoin.selfJoin(pts.toDF("id", "x", "y"), "id", "x", "y", 3.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, "duplicate pair rows emitted")
    assert(rows.toSet == brute(pts, 3.0))
  }

  test("negative coordinates bucket correctly (floor, not truncate)") {
    val pts = Seq((1L, -0.5, -0.5), (2L, 0.5, 0.5), (3L, -3.9, -3.9))
    val got = run(pts, 2.0)
    assert(got == brute(pts, 2.0))
    assert(got.contains((1L, 2L)))
  }
}

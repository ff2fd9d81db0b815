package graft.serve

import graft.SparkSpec
import graft.bdb.BdbMini

class PlayQueriesSpec extends SparkSpec {

  private lazy val tracking = {
    val (_, _, _, _, t) = BdbMini.load(spark)
    t.cache()
  }

  test("playFrame returns all tracked entities of one frame") {
    val frame = PlayQueries.playFrame(tracking, 2022090800L, 100, 20)
    assert(frame.count() == 24) // QB + ball + 5 RR + 6 OL + 11 DEF
    assert(frame.filter("displayName = 'football'").count() == 1)
  }

  test("reachPolygon yields 360 field-clamped vertices around the player") {
    val poly = PlayQueries.reachPolygon(tracking, 2022090800L, 100, 20,
      nflId = 10L, ballSpeed = 20.0, bx = 40.0, by = 26.65)
    assert(poly.length == 360)
    assert(poly.forall { case (_, x, y) =>
      x >= 0 && x <= 120 && y >= 0 && y <= 53.3 })
    // vertices enclose the player's position at nonzero distance
    assert(poly.exists { case (_, x, _) => x > 0 })
  }
}

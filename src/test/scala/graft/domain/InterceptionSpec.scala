package graft.domain

import org.scalatest.funsuite.AnyFunSuite

class InterceptionSpec extends AnyFunSuite {
  import Interception._

  /** Numeric cross-check: bisection on the meet condition
    * f(t) = ‖D + vp·t·u‖ − vb·t, which the closed form must zero. */
  private def numericRadius(vp: Double, px: Double, py: Double,
                            vb: Double, bx: Double, by: Double,
                            theta: Double): Double = {
    val (dx, dy) = (px - bx, py - by)
    val (ux, uy) = (math.cos(theta), math.sin(theta))
    def f(t: Double) =
      math.hypot(dx + vp * t * ux, dy + vp * t * uy) - vb * t
    var lo = 0.0
    var hi = 1.0
    while (f(hi) > 0 && hi < 1e6) hi *= 2 // bracket the root
    var i = 0
    while (i < 200) {
      val mid = (lo + hi) / 2
      if (f(mid) > 0) lo = mid else hi = mid
      i += 1
    }
    vp * (lo + hi) / 2
  }

  /** 500 seeded random kinematic states (property-style, deterministic). */
  private def randomStates: Seq[(Double, Double, Double, Double, Double, Double, Int)] = {
    val rnd = new scala.util.Random(20260812L)
    Seq.fill(500) {
      val vp = 1.0 + rnd.nextDouble() * 10.0
      val vb = 12.0 + rnd.nextDouble() * 18.0 // ball faster than receiver
      val px = 1.0 + rnd.nextDouble() * 118.0
      val py = 1.0 + rnd.nextDouble() * 51.0
      val bx = 1.0 + rnd.nextDouble() * 118.0
      val by = 1.0 + rnd.nextDouble() * 51.0
      (vp, px, py, vb, bx, by, rnd.nextInt(360))
    }
  }

  test("closed form agrees with numeric bisection for random states") {
    for ((vp, px, py, vb, bx, by, deg) <- randomStates) {
      val theta = math.toRadians(deg)
      val analytic = radiusAt(vp, px, py, vb, bx, by, theta)
      val numeric = numericRadius(vp, px, py, vb, bx, by, theta)
      assert(math.abs(analytic - numeric) < 1e-6,
        s"analytic=$analytic numeric=$numeric at $vp,$px,$py,$vb,$bx,$by,$deg")
    }
  }

  test("closed form satisfies the meet equation exactly") {
    for ((vp, px, py, vb, bx, by, deg) <- randomStates) {
      val theta = math.toRadians(deg)
      val r = radiusAt(vp, px, py, vb, bx, by, theta)
      val t = r / vp
      val mx = px + r * math.cos(theta) - bx
      val my = py + r * math.sin(theta) - by
      assert(math.abs(math.hypot(mx, my) - vb * t) < 1e-6)
    }
  }

  test("radius grows with receiver speed (ball fixed)") {
    val r1 = radiusAt(4.0, 30, 20, 20.0, 60, 26, 1.0)
    val r2 = radiusAt(8.0, 30, 20, 20.0, 60, 26, 1.0)
    assert(r2 > r1)
  }

  test("radius shrinks as the ball gets faster") {
    val slow = radiusAt(6.0, 30, 20, 15.0, 60, 26, 2.0)
    val fast = radiusAt(6.0, 30, 20, 28.0, 60, 26, 2.0)
    assert(fast < slow)
  }

  test("360-profile has no NaN and headings away from the ball reach farther") {
    val radii = partialRadius(6.0, 40, 26, 20.0, 60, 26)
    assert(radii.length == 360)
    assert(radii.forall(r => !r.isNaN && r > 0))
    // ball is due east (+x): running west (180°) must beat running east (0°)
    assert(radii(180) > radii(0))
  }

  test("clampedReach stays inside the field box") {
    val (x, y) = clampedReach(118, 52, math.toRadians(45), 10)
    assert(x <= FieldX && y <= FieldY)
    val (x2, y2) = clampedReach(1, 1, math.toRadians(225), 10)
    assert(x2 >= 0 && y2 >= 0)
  }
}

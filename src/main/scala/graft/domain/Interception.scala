package graft.domain

/** K1 — the interception-radius kernel (SURVEY.md §2.8).
  *
  * Reference semantics (`radius_model.R:9-79`): for a receiver at
  * (px, py) moving at speed vp and a ball launched from (bx, by) at speed
  * vb, compute for each of 360 headings θ the distance the receiver can
  * travel along θ before the ball could meet him — the reference finds it
  * by minimizing ‖P(t,θp) − B(t,θb)‖² with 360 L-BFGS-B solves per row
  * (`radius_model.R:47-54`).
  *
  * The inner problem has a CLOSED FORM: the meet condition along heading
  * u(θ) is ‖D + vp·t·u‖ = vb·t with D = P − B, which is quadratic in t:
  *
  *   (vp² − vb²)·t² + 2·vp·(D·u)·t + ‖D‖² = 0
  *
  * For vb > vp the smallest positive root is
  *   t(θ) = (vp·(D·u) + sqrt(vp²·(D·u)² + (vb²−vp²)·‖D‖²)) / (vb²−vp²)
  * and the radius is r(θ) = vp·t(θ). We implement this analytically —
  * ~360 fused multiply-adds instead of 360 optimizer runs per row — and
  * keep a numeric bisection cross-check in the test suite
  * (InterceptionSpec) as SURVEY.md §7.3 prescribes.
  *
  * The field-clamped variant mirrors `killer_plot_function.R:58-70`
  * (120 × 53.3-yd field).
  */
object Interception {

  val FieldX = 120.0
  val FieldY = 53.3

  /** Closed-form interception radius for one heading (radians). */
  def radiusAt(vp: Double, px: Double, py: Double,
               vb: Double, bx: Double, by: Double, theta: Double): Double = {
    val dx = px - bx
    val dy = py - by
    val d2 = dx * dx + dy * dy
    val du = dx * math.cos(theta) + dy * math.sin(theta)
    if (vb > vp) {
      val a = vb * vb - vp * vp
      val t = (vp * du + math.sqrt(vp * vp * du * du + a * d2)) / a
      vp * t
    } else {
      // receiver at least as fast as the ball: he can outrun it along
      // headings pointing away; the quadratic root is valid only when
      // the ball still closes (du < 0 side), otherwise unbounded — the
      // reference's optimizer saturates; we cap at one field length.
      val a = vp * vp - vb * vb
      val disc = vp * vp * du * du - a * d2
      if (disc >= 0 && du < 0) {
        val t = (-vp * du - math.sqrt(disc)) / a
        math.min(vp * t, FieldX)
      } else FieldX
    }
  }

  /** 360-heading radius profile (θ = 0°..359°), the reach polygon of
    * entry point C (`Visualization.R:340-347`). */
  def partialRadius(vp: Double, px: Double, py: Double,
                    vb: Double, bx: Double, by: Double): Array[Double] = {
    val out = new Array[Double](360)
    var deg = 0
    while (deg < 360) {
      out(deg) = radiusAt(vp, px, py, vb, bx, by, math.toRadians(deg))
      deg += 1
    }
    out
  }

  /** Field-clamped reach point along θ (killer_plot_function.R:58-70):
    * walk r(θ) from (px,py) but stop at the sideline/endline box. */
  def clampedReach(px: Double, py: Double, theta: Double, r: Double): (Double, Double) = {
    val x = math.max(0.0, math.min(FieldX, px + r * math.cos(theta)))
    val y = math.max(0.0, math.min(FieldY, py + r * math.sin(theta)))
    (x, y)
  }
}

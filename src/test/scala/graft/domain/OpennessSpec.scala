package graft.domain

import org.scalatest.funsuite.AnyFunSuite

class OpennessSpec extends AnyFunSuite {
  import Openness._

  private val base = (6.0, 0.5, 40.0, 26.0, 20.0, 60.0, 26.0, 42L)

  private def score(defenders: Seq[Defender], seed: Long = 42L,
                    vs: Double = 6.0, px: Double = 40.0, py: Double = 26.0): Double =
    openCount(vs, 0.5, px, py, defenders, 20.0, 60.0, 26.0, seed)

  test("deterministic: same seed twice gives the identical score") {
    val d = Seq(Defender(42, 27, 7.0))
    assert(score(d) == score(d))
  }

  test("different seeds give different (but close) scores") {
    val a = score(Nil, seed = 1L)
    val b = score(Nil, seed = 2L)
    assert(a != b)
    // Monte-Carlo estimates of the same integral: within a few percent
    assert(math.abs(a - b) / math.max(a, b) < 0.1)
  }

  test("adding a defender never increases openness") {
    val none = score(Nil)
    val one = score(Seq(Defender(42, 27, 7.0)))
    val two = score(Seq(Defender(42, 27, 7.0), Defender(41, 25, 7.5)))
    assert(one <= none)
    assert(two <= one)
  }

  test("a defender standing on the receiver erases nearly all openness") {
    val none = score(Nil)
    val smothered = score(Seq(Defender(40.0, 26.0, 12.0)))
    assert(smothered < none * 0.2)
  }

  test("defender-free score matches the analytic reachable area") {
    // with no defenders, every sampled point the receiver beats the ball
    // to scores >= 1; for a receiver far from the thrower, receiver time
    // < ball time holds for ~the whole small reach box, so
    // score/samples ∈ [1, 1.2] (the 0.2 heading bonus on a π/4 wedge).
    val vs = 3.0
    val reach = vs * 1.0
    val area = (2 * reach) * (2 * reach)
    val n = math.ceil(area * 100).toInt
    val s = openCount(vs, 0.5, 20.0, 26.0, Nil, 25.0, 110.0, 26.0, 7L)
    val perSample = s / n
    assert(perSample >= 0.95 && perSample <= 1.25, s"perSample=$perSample")
  }

  test("zero-speed receiver has zero openness (degenerate box)") {
    assert(score(Nil, vs = 0.0) == 0.0)
  }
}

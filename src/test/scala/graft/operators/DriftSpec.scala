package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** v17's refit trigger, exercised on geometry where the answer is
  * known: the drift monitor must FIRE on a delta drawn from a shifted
  * distribution and stay quiet on a delta drawn from the base one.
  * The registered query hash-gates the arithmetic against DuckDB; this
  * spec gates the monitor's DISCRIMINATION — a monitor that always (or
  * never) crosses its threshold is dead code with a green oracle. The
  * measured margins here are the SCALING.md "drift monitor" rows. */
class DriftSpec extends SparkSpec {

  private val dim = 32
  private val rnd = new scala.util.Random(11)

  private def unit(a: Array[Double]): Array[Double] = {
    val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
  }
  private val centers = Array.fill(16)(unit(Array.fill(dim)(rnd.nextGaussian())))

  private def draw(id: Long, center: Array[Double], noise: Double) =
    (id, center.map(_ + rnd.nextGaussian() * noise).map(_.toFloat).toSeq)

  /** (mean_qerr, max_cell_share) via v17's exact register math. */
  private def drift(df: DataFrame, cents: Array[Array[Double]]): (Double, Double) = {
    val ad = IvfAnn.assignWithDist(df, cents)
    val r = ad.agg(count(lit(1)).as("n"), sum("qerr_nano").as("s")).head
    val (n, s) = (r.getLong(0), r.getLong(1))
    val mx = ad.groupBy("cell").count().agg(max("count")).head.getLong(0)
    (s.toDouble / (n.toDouble * 1e9), mx.toDouble / n.toDouble)
  }

  test("qerr_ratio fires on a shifted delta and stays quiet on a clean one") {
    import spark.implicits._
    val base = (for (k <- 0 until 16; j <- 0 until 25)
      yield draw(k * 100 + j, centers(k), 0.05)).toDF("vec_id", "embedding")
    val cents = IvfAnn.fitCentroids(base, nCells = 16)

    val clean = (for (k <- 0 until 16; j <- 0 until 6)
      yield draw(10000 + k * 10 + j, centers(k), 0.05)).toDF("vec_id", "embedding")
    // the shifted crawl: content moved off the fitted manifold — new
    // cluster centers the frozen quantizer has never seen
    val newCenters = Array.fill(4)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val shifted = (for (k <- 0 until 4; j <- 0 until 24)
      yield draw(20000 + k * 100 + j, newCenters(k), 0.05)).toDF("vec_id", "embedding")

    val (baseQ, baseShare) = drift(base, cents)
    val (cleanQ, cleanShare) = drift(clean, cents)
    val (shiftQ, shiftShare) = drift(shifted, cents)
    val cleanRatio = cleanQ / baseQ
    val shiftRatio = shiftQ / baseQ
    info(f"base mean_qerr=$baseQ%.4f share=$baseShare%.3f | " +
      f"clean ratio=$cleanRatio%.3f share=$cleanShare%.3f | " +
      f"shifted ratio=$shiftRatio%.3f share=$shiftShare%.3f")

    // the documented refit threshold (SCALING.md): qerr_ratio > 1.5
    assert(cleanRatio < 1.5,
      f"clean delta must not trip the refit trigger (ratio $cleanRatio%.3f)")
    assert(cleanRatio > 0.5, "clean ratio should sit near 1 — fixture broken")
    assert(shiftRatio > 1.5,
      f"shifted delta must trip the refit trigger (ratio $shiftRatio%.3f)")
    // and the skew channel agrees: off-manifold vectors pile into the
    // few cells nearest the new material, so max share jumps too
    assert(shiftShare > cleanShare * 2,
      f"shifted delta should skew occupancy ($shiftShare%.3f vs $cleanShare%.3f)")
  }
}

package graft.serve

import graft.domain.Interception
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SURVEY.md §3.3 entry point C — the interactive play viewer's data
  * services. The engine serves two queries fast enough for frame
  * stepping; rendering stays out of scope (SURVEY.md §2.10).
  *
  * Scale notes: `playFrame` is a (gameId, playId, frameId) point lookup
  * — on a gameId-partitioned layout it partition-prunes to one
  * directory and row-group-skips inside it (P11); the polygon is pure
  * driver-side math on the ≤23 rows returned (no cluster round-trip per
  * UI click beyond the frame fetch).
  */
object PlayQueries {

  /** One frame of one play: every tracked entity's kinematics (P11). */
  def playFrame(tracking: DataFrame, gameId: Long, playId: Int, frameId: Int): DataFrame =
    tracking
      .filter(col("gameId") === gameId && col("playId") === playId &&
              col("frameId") === frameId)
      .select("nflId", "displayName", "club", "x", "y", "s", "a", "o", "dir", "event")

  /** Reach polygon for one entity in one frame: the K1 360-heading
    * radius profile as (angleDeg, x, y) vertices, field-clamped
    * (`Visualization.R:340-382`). */
  def reachPolygon(tracking: DataFrame, gameId: Long, playId: Int, frameId: Int,
                   nflId: Long, ballSpeed: Double, bx: Double, by: Double): Seq[(Int, Double, Double)] = {
    val row = playFrame(tracking, gameId, playId, frameId)
      .filter(col("nflId") === nflId)
      .select("x", "y", "s").head()
    val (px, py, vp) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val radii = Interception.partialRadius(vp, px, py, ballSpeed, bx, by)
    radii.toIndexedSeq.zipWithIndex.map { case (r, deg) =>
      val (x, y) = Interception.clampedReach(px, py, math.toRadians(deg), r)
      (deg, x, y)
    }
  }
}

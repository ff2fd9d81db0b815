package graft.functions

import org.apache.spark.sql.DataFrame

/** Driver-side collects with an executable size contract.
  *
  * The decontamination gates (x16, the x18 stage-5 filter) broadcast a
  * held-out benchmark shingle set that is small BY CONSTRUCTION — but a
  * mis-sized eval filter would silently pull a corpus slice onto the
  * driver. These helpers make the contract executable: the scan is capped
  * with `limit(cap + 1)` BEFORE collecting (so an oversized set costs one
  * extra row, never an OOM), then `require`s the bound.
  *
  * Cap default: 2²⁰ entries ≈ 8 MB of longs — two decades above the
  * largest observed eval set (8 033 distinct shingles at sf0.1, ~10⁵ at
  * the synthetic sf1) and far below driver/broadcast limits, so a trip
  * means a broken filter, not a close call.
  */
object BoundedCollect {
  val DefaultCap: Int = 1 << 20

  def longs(df: DataFrame, what: String, cap: Int = DefaultCap): Seq[Long] = {
    val xs = df.limit(cap + 1).collect()
    require(xs.length <= cap,
      s"$what: collected eval set exceeds $cap entries — the 'small by " +
        "construction' contract is broken (mis-sized filter collecting a " +
        "corpus slice?)")
    xs.map(_.getLong(0)).toSeq
  }

  def strings(df: DataFrame, what: String, cap: Int = DefaultCap): Seq[String] = {
    val xs = df.limit(cap + 1).collect()
    require(xs.length <= cap,
      s"$what: collected eval set exceeds $cap entries — the 'small by " +
        "construction' contract is broken (mis-sized filter collecting a " +
        "corpus slice?)")
    xs.map(_.getString(0)).toSeq
  }
}

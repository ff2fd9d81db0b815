package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** AMS/AGMS (Alon-Matias-Szegedy) SIGNED frequency sketch as a custom
  * Catalyst `TypedImperativeAggregate` — the third sketch in the family
  * (Count-Min counts, HLL distincts, AMS second moments / join sizes).
  *
  * Each cell accumulates `sign(k) · f(k)` instead of Count-Min's
  * `+f(k)`: the signs make the cross-key collision terms cancel in
  * expectation, so the inner product of two tables' sketches estimates
  * `|A ⋈ B|` with variance ≈ F₂(A)·F₂(B)/width — a RELATIVE error
  * bound — where Count-Min's unsigned inner product overestimates by
  * the additive ≈ N₁N₂/width (measured 1.9×/18×/183× over three
  * decades on the FK join at width 8192; the signed sketch is within
  * ~1% on the same data, see a31's scaladoc). State is one
  * depth × width Long array whatever the key cardinality; `merge` is
  * element-wise addition, so partials combine map-side and the
  * exchange carries one buffer per partition. The published estimate
  * is the MEDIAN of the per-row inner products (depth odd ⇒ an exact
  * order statistic, no averaging).
  *
  * Portability (the engine's exact-oracle discipline): cells are
  * affine maps and signs are degree-3 polynomials modulo the Mersenne
  * prime 2³¹−1, all in BIGINT arithmetic (see the companion's
  * constants note on WHY cubic), so DuckDB regenerates every signed
  * cell and the whole estimator replays hash-exactly, like
  * [[CountMinAgg]] and unlike library AMS implementations whose seeds
  * are engine-internal.
  */
case class AmsAgg(child: Expression, depth: Int, width: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && depth <= AmsAgg.HashA.length,
    s"ams_sketch depth must be in [1, ${AmsAgg.HashA.length}]")
  require(width > 1 && width <= (1 << 20), "ams_sketch width must be in [2, 2^20]")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + AmsAgg.cell(k, d, width)) += AmsAgg.sign(k, d)
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  // versioned via SketchWire (round-9 ADVICE): the streaming state store
  // persists this serialized buffer across restarts, and the round-9
  // mod-P hash change altered cell semantics without changing layout —
  // the version byte makes a cross-version restore fail loudly.
  override def serialize(buf: Array[Long]): Array[Byte] = SketchWire.toBytes(buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchWire.fromBytes(bytes, prettyName)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): AmsAgg =
    copy(child = newChild)
  override def prettyName: String = "ams_sketch"
}

object AmsAgg {
  /** Hash constants (classic public-domain LCG multipliers/increments,
    * all < 2³¹) and the Mersenne prime modulus. Cell rows extend the
    * CountMinAgg affine family; SIGN rows are DEGREE-3 polynomials mod
    * P — the 4-wise-independent family the AMS variance bound needs.
    * An affine (2-wise) sign was tried first and REJECTED by
    * measurement: on the dense consecutive orderkeys the sign deltas
    * s(k)·s(k+δ) are near-deterministic per δ, and the estimator
    * landed 42% under the true join size at sf0.01; the cubic signs
    * bring it to 0.8% on the same data. The key is reduced mod P
    * first — in BOTH cell() and sign() (round-9 advisory closed the
    * cell() gap) — so every multiply-add stays below 2^62 for ANY
    * long key, where an unreduced `k * A_d` would silently wrap in
    * the JVM while the oracle's BIGINT raises overflow. Values are
    * unchanged for keys in [0, P). Fixed so the DuckDB oracle
    * regenerates every signed cell. */
  val P: Long = 2147483647L
  val HashA: Array[Long] = Array(1103515245L, 69069L, 1664525L, 22695477L, 1566083941L)
  val HashB: Array[Long] = Array(12345L, 1L, 1013904223L, 1L, 3L)
  /** (c3, c2, c1, c0) per hash row. */
  val Poly: Array[(Long, Long, Long, Long)] = Array(
    (1181783497L, 69621L, 1103515245L, 12345L),
    (214013L, 2531011L, 69069L, 1L),
    (134775813L, 1L, 1664525L, 1013904223L),
    (16843009L, 826366247L, 22695477L, 1L),
    (48271L, 16807L, 69621L, 7L))

  def cell(k: Long, d: Int, width: Int): Int = {
    val kk = ((k % P) + P) % P
    ((kk * HashA(d) + HashB(d)) % P % width).toInt
  }

  /** ±1 from the low bit of a degree-3 polynomial mod P (Horner with
    * a mod after every multiply-add; k pre-reduced into [0, P)). */
  def sign(k: Long, d: Int): Long = {
    val (c3, c2, c1, c0) = Poly(d)
    val kk = ((k % P) + P) % P
    val v = (((c3 * kk + c2) % P * kk + c1) % P * kk + c0) % P
    v % 2 * 2 - 1
  }

  /** The SQL VALUES clause replaying cell AND sign-polynomial rows. */
  def hashRowsSql(depth: Int): String =
    (0 until depth).map { d =>
      val (c3, c2, c1, c0) = Poly(d)
      s"(CAST($d AS BIGINT), ${HashA(d)}, ${HashB(d)}, $c3, $c2, $c1, $c0)"
    }.mkString("(VALUES ", ", ", ") AS h(d, a, b, s3, s2, s1, s0)")
}

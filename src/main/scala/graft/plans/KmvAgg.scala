package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.ByteBuffer

/** KMV (k-minimum-values / bottom-k "theta") distinct sketch as a custom
  * Catalyst `TypedImperativeAggregate` — the fourth sketch in the family
  * (Count-Min counts, HLL distincts, AMS moments, KMV SET ALGEBRA).
  *
  * State is the k smallest DISTINCT hash values of the keys under the
  * engine's portable SplitMix64 scramble (`Openness.mix64` — a
  * BIJECTION, so distinct keys give distinct hashes and set semantics
  * need no collision handling), compared as UNSIGNED 64-bit. `merge` is
  * set-union-then-truncate — idempotent, commutative, associative — so
  * partials combine map-side, re-delivery cannot change the state, and
  * a streaming complete-mode aggregate ends in exactly the batch buffer
  * (the HLL twin property).
  *
  * Why a fourth distinct sketch when HLL exists: KMV's kept values are
  * a uniform SAMPLE of the key space, so two sketches support DIRECT
  * set-operation estimates — intersection, Jaccard — where HLL only
  * offers inclusion–exclusion on two noisy estimates (a30's `est_inter`
  * can even go negative). The theta-sketch algebra: with threshold
  * T = min over sketches of (k-th smallest value, or 2⁶⁴ when a sketch
  * holds < k values), every kept value < T is a sample with inclusion
  * probability T/2⁶⁴, so |A∩B| ≈ |{v ∈ A∩B : v < T}|·2⁶⁴/T — one
  * integer division. At 100 TB the sketches ride any scan as k·8-byte
  * state per group and every later overlap question runs at register
  * scale (a34 joins a 3-row table).
  *
  * Portability (the family's exact-oracle discipline): mix64 replays in
  * DuckDB (`OracleU64.mix64Ctes`), "k smallest unsigned" is a UBIGINT
  * `row_number() <= k`, and the estimators are single HUGEINT floor
  * divisions — REGISTER CONTENT (the k minima, bit for bit) AND every
  * estimate are hash-checked in a33/a34, like the other three sketches.
  * The single-set estimator is the classic unbiased bottom-k form
  * `(k-1)·2⁶⁴ / v_k` (v_k = the k-th smallest, i.e. the kept max);
  * sketches holding < k values report their EXACT count (`band` column
  * says which fired — the a29 `est_corrected` lesson applied from
  * birth).
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 16), "kmv_sketch k must be in [2, 65536]")

  private def newSet() =
    new java.util.TreeSet[java.lang.Long](KmvAgg.UnsignedOrder)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] = newSet()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null)
      KmvAgg.insert(buf, graft.domain.Openness.mix64(v.asInstanceOf[Long]), k)
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) KmvAgg.insert(b1, it.next(), k)
    b1
  }

  /** Kept minima in unsigned-ascending order (raw signed bit patterns —
    * the oracle emits the same bits via CAST(seed AS BIGINT)). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val s = newSet()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) s.add(bb.getLong)
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
  override def prettyName: String = "kmv_sketch"
}

object KmvAgg {

  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** Insert one hash, keeping only the k unsigned-smallest distinct. */
  def insert(s: java.util.TreeSet[java.lang.Long], h: Long, k: Int): Unit = {
    if (s.size < k) { s.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, s.last()) < 0) {
      if (s.add(h)) s.pollLast()
      ()
    }
  }

  private val Two64 = BigInt(1) << 64

  private def unsigned(h: Long): BigInt =
    BigInt(java.lang.Long.toUnsignedString(h))

  /** Classic bottom-k estimate from a kept-minima array (unsigned
    * ascending): exact count when the set never filled, else
    * floor((k-1)·2⁶⁴ / v_k). Driver/test twin of the a33 column. */
  def estimate(kept: Seq[Long], k: Int): Long =
    if (kept.size < k) kept.size.toLong
    else {
      val e = (BigInt(k - 1) * Two64) / unsigned(kept.last)
      // v_k below ~k forces est past 2^63 — unreachable from hashing
      // real data (it means > ~2^57 distinct keys), but a corrupted
      // buffer must fail loudly, not wrap (the HllAgg.estimate rule)
      require(e.isValidLong, s"KMV estimate overflows Long (v_k=${kept.last})")
      e.toLong
    }

  /** Theta threshold of one sketch: v_k when full, else 2⁶⁴ (exact). */
  def theta(kept: Seq[Long], k: Int): BigInt =
    if (kept.size < k) Two64 else unsigned(kept.last)

  /** Two-sketch set algebra under T = min(θ_A, θ_B): every kept value
    * unsigned-< T is a sample with inclusion probability T/2⁶⁴.
    * Returns (est_union, est_inter, jaccard_bp) as exact integer floor
    * divisions (jaccard in basis points; 0 when the union sample is
    * empty). */
  def setAlgebra(a: Seq[Long], b: Seq[Long], k: Int): (Long, Long, Long) = {
    val t = theta(a, k).min(theta(b, k))
    val sa = a.filter(unsigned(_) < t).toSet
    val sb = b.filter(unsigned(_) < t).toSet
    val nU = BigInt((sa ++ sb).size)
    val nI = BigInt((sa & sb).size)
    val estU = nU * Two64 / t
    val estI = nI * Two64 / t
    // same guard as estimate(): a corrupted/adversarial buffer with a
    // tiny v_k must fail loudly, not wrap (round-9 ADVICE)
    require(estU.isValidLong && estI.isValidLong,
      s"KMV set-algebra estimate overflows Long (theta=$t, nU=$nU, nI=$nI)")
    val jbp = if (nU == 0) 0L else (nI * 10000 / nU).toLong
    (estU.toLong, estI.toLong, jbp)
  }
}

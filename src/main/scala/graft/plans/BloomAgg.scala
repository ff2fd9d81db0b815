package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter as a custom Catalyst `TypedImperativeAggregate` — the
  * fifth sketch in the family (Count-Min counts, HLL distincts, AMS
  * moments, KMV set algebra, Bloom MEMBERSHIP). The engine already
  * ships an engine-internal bloom path (`operators.BloomPrune` wraps
  * `DataFrameStatFunctions.bloomFilter` for the j16 semi-join); this
  * aggregate is its PORTABLE twin, built for the family's exact-oracle
  * discipline: bit positions are the same affine maps modulo the
  * Mersenne prime 2³¹−1 that [[CountMinAgg.cell]] uses (shared code,
  * cannot drift), so DuckDB regenerates the ENTIRE bitmap, replays
  * membership tests bit-for-bit, and the no-false-negative invariant
  * and the measured false-positive rate are hash-checked query output
  * (a35), not library folklore.
  *
  * State is `bits/64` Longs whatever the key count; `update` ORs
  * `depth` bits per key; `merge` is element-wise OR — idempotent,
  * commutative, associative, so partials combine map-side, re-delivery
  * cannot change the bitmap, and a streaming complete-mode aggregate
  * drains to exactly the batch words (the HLL/KMV twin property).
  *
  * Sizing is the user's contract, surfaced rather than hidden: a35
  * publishes the fill ratio and measured FPR alongside the bitmap —
  * at 10× the keys with the same `bits` the filter visibly saturates
  * toward FPR 1 (still zero false negatives), which is the honest
  * scale behavior (size `bits` ≈ 1.44·depth·n for the target FPR).
  */
case class BloomAgg(child: Expression, bits: Int, depth: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bits >= 64 && bits % 64 == 0 && bits <= (1 << 26),
    "bloom_agg bits must be a multiple of 64 in [64, 2^26]")
  require(depth > 0 && depth <= CountMinAgg.HashA.length,
    s"bloom_agg depth must be in [1, ${CountMinAgg.HashA.length}]")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        val pos = CountMinAgg.cell(k, d, bits)
        buf(pos >>> 6) |= 1L << (pos & 63)
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  /** Driver/test twin of the distributed bitmap. */
  def bitmapOf(keys: Iterable[Long], bits: Int, depth: Int): Array[Long] = {
    val words = new Array[Long](bits / 64)
    keys.foreach { k =>
      var d = 0
      while (d < depth) {
        val pos = CountMinAgg.cell(k, d, bits)
        words(pos >>> 6) |= 1L << (pos & 63)
        d += 1
      }
    }
    words
  }

  /** Membership test against a bitmap (no false negatives possible). */
  def contains(words: Array[Long], k: Long, bits: Int, depth: Int): Boolean = {
    var d = 0
    while (d < depth) {
      val pos = CountMinAgg.cell(k, d, bits)
      if ((words(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      d += 1
    }
    true
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch as a custom Catalyst `TypedImperativeAggregate` —
  * the bounded-memory scale twin of `x21_heavy_hitters`' exact counting
  * (reference analog: frequency tables over full group-bys, e.g.
  * `DefCoverage.ipynb` count blocks; at 100 TB a full `GROUP BY key`
  * over a heavy-tailed key is the memory hazard this sketch removes).
  *
  * The aggregation state is ONE fixed `depth x width` Long array
  * (4x64 cells = 2 KiB here) regardless of input size or key
  * cardinality: `update` increments one cell per hash row, `merge` is
  * element-wise addition — associative and commutative, so Spark's
  * partial aggregation applies map-side and the exchange carries one
  * 2 KiB buffer per partition instead of per-key rows. A point estimate
  * is min over the d cells a key hashes to (overestimate-only, bounded
  * by eps = e/width of total count — asserted in CountMinSpec).
  *
  * Portability is the design constraint (the engine's exact-oracle
  * discipline): cell hashes are affine maps modulo the Mersenne prime
  * 2^31-1 in BIGINT arithmetic — `((k*A_d + B_d) % P + P) % P % width`
  * — which DuckDB replays verbatim in SQL, so even the SKETCH CONTENT
  * is hash-checked against the oracle (a20/s23's HLL sketches are
  * engine-internal and spec-gated; this one is oracle-green).
  */
case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0 && depth <= CountMinAgg.HashA.length,
    s"count_min depth must be in [1, ${CountMinAgg.HashA.length}]")
  require(width > 1 && width <= (1 << 20), "count_min width must be in [2, 2^20]")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinAgg.cell(k, d, width)) += 1L
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  /** Affine hash-row constants (classic LCG multipliers/increments —
    * public-domain numerical-recipes values) and the Mersenne prime
    * modulus. Fixed so the DuckDB oracle regenerates every cell.
    *
    * The key is reduced mod P BEFORE the multiply (round-9 advisory
    * fix, same as [[AmsAgg.sign]] always did): `k * A_d` on a raw key
    * > ~2^32 silently wraps in JVM long arithmetic while the oracle's
    * identical BIGINT expression raises an overflow error — the
    * pre-reduction keeps every intermediate below 2^62 for ANY long
    * key on both engines. Values are unchanged for keys in [0, P). */
  val P: Long = 2147483647L
  val HashA: Array[Long] = Array(1103515245L, 69069L, 1664525L, 22695477L)
  val HashB: Array[Long] = Array(12345L, 1L, 1013904223L, 1L)

  def cell(k: Long, d: Int, width: Int): Int = {
    val kk = ((k % P) + P) % P
    ((kk * HashA(d) + HashB(d)) % P % width).toInt
  }

  /** The SQL VALUES clause replaying the hash rows (oracle building block). */
  def hashRowsSql(depth: Int): String =
    (0 until depth).map(d => s"(CAST($d AS BIGINT), ${HashA(d)}, ${HashB(d)})")
      .mkString("(VALUES ", ", ", ") AS h(d, a, b)")
}

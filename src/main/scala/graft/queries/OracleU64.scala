package graft.queries

/** Builders for unsigned-64-bit wrap arithmetic in DuckDB oracle SQL —
  * what lets a second engine replay the engine's SplitMix64-derived
  * seeds and shuffle keys (Openness.mix64 / the native `mix64`
  * expression) bit-for-bit. Values live as native UBIGINT; the wrap
  * multiply splits into 32-bit halves whose partial products all stay
  * below 2^64, with a single HUGEINT add-then-mask roundtrip. Every
  * intermediate must land in a NAMED CTE COLUMN: DuckDB does not CSE
  * textually repeated expression trees, and a macro-style expansion of
  * the same math measured 28x slower (175 s -> 6 s on k2's 5M samples).
  */
private[queries] object OracleU64 {
  val G  = "11400714819323198485"  // 0x9E3779B97F4A7C15 (golden gamma)
  val C1 = "13787848793156543929"  // 0xBF58476D1CE4E5B9
  val C2 = "10723151780598845931"  // 0x94D049BB133111EB
  private val m32 = "4294967295"
  private val m64 = "18446744073709551615"

  /** (a*b) mod 2^64 over UBIGINT column refs. */
  def umul(a: String, b: String): String =
    s"CAST((CAST((($a) & $m32) * (($b) & $m32) AS HUGEINT)" +
      s" + CAST((((((($a) & $m32) * (($b) >> 32)) & $m32)" +
      s" + (((($a) >> 32) * (($b) & $m32)) & $m32)) & $m32) << 32 AS HUGEINT))" +
      s" & $m64 AS UBIGINT)"

  /** (a+b) mod 2^64 over UBIGINT column refs. */
  def uadd(a: String, b: String): String =
    s"CAST((CAST(($a) AS HUGEINT) + CAST(($b) AS HUGEINT)) & $m64 AS UBIGINT)"

  /** CTE chunk computing `outCol` = mix64(`inCol`) over every row of CTE
    * `src` (keeps all of src's columns). Emits CTEs `<p>0..<p>4` and the
    * final CTE named `out`. Splice between two commas of a WITH list. */
  def mix64Ctes(src: String, inCol: String, out: String, outCol: String,
                p: String): String =
    s"""${p}0 AS (SELECT *, ${uadd(inCol, G)} AS ${p}z0 FROM $src),
       |${p}1 AS (SELECT *, xor(${p}z0, ${p}z0 >> 30) AS ${p}w0 FROM ${p}0),
       |${p}2 AS (SELECT *, ${umul(s"${p}w0", C1)} AS ${p}z1 FROM ${p}1),
       |${p}3 AS (SELECT *, xor(${p}z1, ${p}z1 >> 27) AS ${p}w1 FROM ${p}2),
       |${p}4 AS (SELECT *, ${umul(s"${p}w1", C2)} AS ${p}z2 FROM ${p}3),
       |$out AS (SELECT *, xor(${p}z2, ${p}z2 >> 31) AS $outCol FROM ${p}4)""".stripMargin

  /** Reinterpret a UBIGINT column as the two's-complement BIGINT the JVM
    * sees — needed whenever the oracle must ORDER BY a mix64 output the
    * same way Spark orders the signed long. */
  def toSigned(u: String): String =
    s"CAST(CAST(($u) AS HUGEINT)" +
      s" - (CASE WHEN ($u) >= 9223372036854775808 THEN CAST($m64 AS HUGEINT) + 1" +
      s" ELSE 0 END) AS BIGINT)"
}

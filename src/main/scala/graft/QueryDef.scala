package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Column names MUST match between `run`'s output and the oracle SQL — the
  * driver sorts columns by name before hashing values. Every query orders
  * its rows deterministically on both sides; Bench strips that terminal
  * oracle-determinism sort before timing (`GraftBenchPlan`), so the
  * determinism costs nothing in the measured path.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Helpers to keep the per-family files terse. */
  def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle))(run)
  /** Rows-only check (no SQL-expressible oracle). */
  def qRowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None)(run)
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** SURVEY.md §2.6 — set ops / reshape (R1, R3-R10).
  *
  * Scale notes: pivots pin their value lists explicitly (stable schema, one
  * shuffle, no values-discovery pass — Spark's two-phase pivot is avoided);
  * union is by-name so schema drift between inputs can't silently misalign
  * columns. The array/horizontal ops (r7/r8) run as codegen'd higher-order
  * functions — no UDF, no shuffle.
  */
object ReshapeQueries {

  val defs: Seq[QueryDef] = Seq(

    // R11 (extension) — set intersection (SURVEY §2.6 "available if
    // ever needed"): customers present in both order-priority segments
    q("r11_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // R12 (extension) — set difference: customers with urgent orders
    // but no low-priority ones
    q("r12_except",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .except(o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // R1 — union-all of homogeneous relations (9 tracking weeks rbind —
    // DataCleaning.R:20); unionByName, with a provenance tag
    q("r1_union_all",
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice, 'high' AS bucket
        |  FROM orders WHERE o_totalprice >= 250000
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'low' AS bucket
        |  FROM orders WHERE o_totalprice < 250000)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") >= 250000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 250000)
        .select(col("o_orderkey"), col("o_totalprice"), lit("low").as("bucket"))
      hi.unionByName(lo).orderBy("o_orderkey")
    },

    // R3 — pivot wider with a PINNED value list (11 defenders → x_1..s_11 —
    // Openness_Data_Frame_Prep.R:38-43); count per event_type per user
    q("r3_pivot_counts",
      """SELECT user_id,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // R4 — pivot table with fill value (position stats → wide play features,
    // fill_value=0 — DefCoverage.ipynb:347-359). DECIMAL sums: exact and
    // order-independent, so the 0-fill compare is deterministic.
    // Terminal CAST to DOUBLE on both sides — decimal output columns cannot
    // hash-match across the driver's readers (arrow Decimal vs duckdb.df()
    // float); the exact-decimal-to-double cast is bit-identical.
    q("r4_pivot_fill",
      """SELECT user_id,
        |       CAST(coalesce(sum(CAST(CASE WHEN event_type = 'click' THEN value END
        |                    AS DECIMAL(18,2))), 0) AS DOUBLE) AS click,
        |       CAST(coalesce(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END
        |                    AS DECIMAL(18,2))), 0) AS DOUBLE) AS purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val pv = Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase"))
        .agg(sum(col("value").cast("decimal(18,2)")))
      pv.select(col("user_id"),
          coalesce(col("click"), lit(0)).cast("double").as("click"),
          coalesce(col("purchase"), lit(0)).cast("double").as("purchase"))
        .orderBy("user_id")
    },

    // R5 — column-name flattening after a multi-stat pivot ({stat}_{pos} —
    // DefCoverage.ipynb:119): Spark names them value_stat; normalize
    // Terminal CAST to DOUBLE on both sides — the rounded DECIMAL(_,4) is
    // exact, so the decimal-to-double cast is bit-identical in both engines
    // (a decimal output column itself cannot hash-match across the driver's
    // readers: arrow Decimal vs duckdb.df() float).
    q("r5_pivot_multi_stat",
      """SELECT user_id,
        |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click_n,
        |       CAST(round(coalesce(sum(CAST(CASE WHEN event_type = 'click' THEN value END
        |             AS DECIMAL(18,6))), 0), 4) AS DOUBLE) AS click_sum,
        |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error_n,
        |       CAST(round(coalesce(sum(CAST(CASE WHEN event_type = 'error' THEN value END
        |             AS DECIMAL(18,6))), 0), 4) AS DOUBLE) AS error_sum
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast("decimal(18,6)")).as("sum"))
        .select(col("user_id"),
          col("click_n"),
          round(coalesce(col("click_sum"), lit(0)), 4).cast("double").as("click_sum"),
          col("error_n"),
          round(coalesce(col("error_sum"), lit(0)), 4).cast("double").as("error_sum"))
        .orderBy("user_id")
    },

    // R6 — NA → constant fill (fillna(0) — DefCoverage.ipynb:604)
    q("r6_na_fill",
      """SELECT o_orderkey,
        |       coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("status_filled"))
        .na.fill("OPEN", Seq("status_filled"))
        .orderBy("o_orderkey")
    },

    // R7 — row-wise nearest-non-NULL horizontal fill across slots
    // (QBReadStats.R:70-93; ties → lower index, matching which.min).
    // Spark side: generic over an ArrayType column via higher-order fns.
    q("r7_nearest_fill",
      """SELECT o_orderkey,
        |       coalesce(s1, s2, s3) AS f1,
        |       coalesce(s2, s1, s3) AS f2,
        |       coalesce(s3, s2, s1) AS f3
        |FROM (SELECT o_orderkey,
        |             NULLIF(o_orderstatus, 'O') AS s1,
        |             CAST(NULL AS VARCHAR) AS s2,
        |             o_orderstatus AS s3
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val slots = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          array(nullif(col("o_orderstatus"), lit("O")),
                lit(null).cast("string"),
                col("o_orderstatus")).as("slots"))
      val filled = slots.withColumn("filled",
        graft.functions.ArrayOps.nearestNonNullFillStr(col("slots")))
      filled.select(col("o_orderkey"),
          element_at(col("filled"), 1).as("f1"),
          element_at(col("filled"), 2).as("f2"),
          element_at(col("filled"), 3).as("f3"))
        .orderBy("o_orderkey")
    },

    // R8 — row-wise argmin across slots, first tie wins (max.col(-diffs),
    // ties.method="first" — QBReadStats.R:102-114)
    q("r8_argmin_slot",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(list_indexof(diffs, list_min(diffs)) AS BIGINT) AS best_slot
        |FROM (SELECT l_orderkey, l_linenumber,
        |             [abs(l_quantity - 10.0), abs(l_quantity - 25.0),
        |              abs(l_quantity - 40.0)] AS diffs
        |      FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, best_slot""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("diffs", array(
          abs(col("l_quantity") - 10.0),
          abs(col("l_quantity") - 25.0),
          abs(col("l_quantity") - 40.0)))
        .withColumn("best_slot", array_position(col("diffs"), array_min(col("diffs"))))
        .select("l_orderkey", "l_linenumber", "best_slot")
        .orderBy("l_orderkey", "l_linenumber", "best_slot")
    },

    // R9 — dynamic field lookup by name via a map column (prob_<coverage> —
    // cover_threshold.R:24-35)
    q("r9_map_lookup",
      """SELECT o_orderkey,
        |       CASE o_orderstatus WHEN 'F' THEN 'finished'
        |                          WHEN 'O' THEN 'open'
        |                          WHEN 'P' THEN 'pending' END AS status_name
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val statusMap = typedLit(Map("F" -> "finished", "O" -> "open", "P" -> "pending"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          element_at(statusMap, col("o_orderstatus")).as("status_name"))
        .orderBy("o_orderkey")
    },

    // R10 — string recode to align label spellings (str_replace_all("[ -]",
    // ".") — cover_threshold.R:16-20)
    q("r10_recode",
      """SELECT DISTINCT o_orderpriority,
        |       regexp_replace(o_orderpriority, '[ -]', '.', 'g') AS normalized
        |FROM orders ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderpriority"),
          regexp_replace(col("o_orderpriority"), "[ -]", ".").as("normalized"))
        .distinct()
        .orderBy("o_orderpriority")
    },

    // R13 — unpivot/melt (wide → long, the inverse of R3's pivot):
    // two part measures become (attr, val) rows via the native
    // Dataset.unpivot — an Expand node, map-only, no shuffle; the
    // oracle is DuckDB's UNPIVOT. Columns are cast to one type first
    // (unpivot requires a common value type on both engines).
    q("r13_unpivot",
      """SELECT p_partkey, attr, val FROM (
        |  UNPIVOT (SELECT p_partkey,
        |                  CAST(p_retailprice AS DOUBLE) AS retailprice,
        |                  CAST(p_size AS DOUBLE) AS size
        |           FROM part)
        |  ON retailprice, size INTO NAME attr VALUE val)
        |ORDER BY p_partkey, attr""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "part")
        .select(col("p_partkey"),
          col("p_retailprice").cast("double").as("retailprice"),
          col("p_size").cast("double").as("size"))
        .unpivot(Array(col("p_partkey")),
                 Array(col("retailprice"), col("size")), "attr", "val")
        .orderBy("p_partkey", "attr")
    },
  )
}

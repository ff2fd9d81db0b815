package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** SURVEY.md §2.2 — projections / filters / predicates (P1-P15), expressed
  * over the synthetic testdata tables.
  *
  * Scale notes: every filter/projection here is a plain Catalyst expression
  * so it is pushed to the parquet scan (PushedFilters / ReadSchema in
  * `.explain`); none of these shuffle except the explicit dedup ops, whose
  * shuffle is on the natural key and benefits from partial aggregation.
  * Reference sites cited per query (see SURVEY §2.2 for file:line).
  */
object ProjectFilterQueries {

  val defs: Seq[QueryDef] = Seq(

    // P1 — column projection (Openness_Data_Frame_Prep.R:21-24)
    q("p1_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P2 — projection + rename (Openness_Data_Frame_Prep.R:97)
    q("p2_rename",
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |       l_extendedprice AS price
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("order_id"),
                col("l_linenumber").as("line_no"),
                col("l_extendedprice").as("price"))
        .orderBy("order_id", "line_no")
    },

    // P4/P6 — conjunctive equality predicates on constants
    // (Openness_Data_Frame_Prep.R:14-15; QBReadStats.R:54)
    q("p4_filter_eq",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P5 — column-to-column predicate (Openness_Data_Frame_Prep.R:34)
    q("p5_col_compare",
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax FROM lineitem
        |WHERE l_discount > l_tax
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_discount") > col("l_tax"))
        .select("l_orderkey", "l_linenumber", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P7 — IN / NOT IN set predicates (BuildingReadOrder.R:56-57)
    q("p7_in_set",
      """SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_orderstatus NOT IN ('P')
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
                !col("o_orderstatus").isin("P"))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")
    },

    // P8 — NULL filtering; testdata has no nulls, so derive them with
    // NULLIF first (Openness_Data_Frame_Prep.R:61 drops NA matchup ids)
    q("p8_null_filter",
      """SELECT o_orderkey, st FROM (
        |  SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st FROM orders)
        |WHERE st IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("st"))
        .na.drop(Seq("st"))
        .orderBy("o_orderkey")
    },

    // P9 — range predicate (QBReadStats.R:287 absoluteYardlineNumber <= 20)
    q("p9_range",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice BETWEEN 400000.0 AND 450000.0
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_totalprice").between(400000.0, 450000.0))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // P11 — row subset by key (one play ≙ one order); the key itself comes
    // from a scalar subquery so the query is SF-independent
    // (FinalPlayVisualization.R:39)
    q("p11_key_lookup",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
        |WHERE l_orderkey = (SELECT max(o_orderkey) FROM orders)
        |ORDER BY l_linenumber""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val maxKey = Tables.load(s, dir, "orders")
        .agg(max("o_orderkey").as("k"))
      // broadcast 1-row lookup — no shuffle of the big side
      li.join(broadcast(maxKey), li("l_orderkey") === maxKey("k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_linenumber")
    },

    // P12 — derived column (mutate/withColumn) (BuildingReadOrder.R:87)
    q("p12_derived",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1 - l_discount) AS revenue,
        |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
        .withColumn("charged", col("revenue") * (lit(1) + col("l_tax")))
        .select("l_orderkey", "l_linenumber", "revenue", "charged")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P13 — conditional expression ladder (QBReadStats.R:195-200)
    q("p13_case_ladder",
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 25 THEN 'mid'
        |            WHEN l_quantity < 40 THEN 'high'
        |            ELSE 'bulk' END AS qty_band
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("qty_band",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 25, "mid")
            .when(col("l_quantity") < 40, "high")
            .otherwise("bulk"))
        .select("l_orderkey", "l_linenumber", "qty_band")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // P14 — distinct (Openness_Data_Frame_Prep.R:83)
    q("p14_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // P15 — keep-first-per-key dedup; the reference's distinct(.keep_all=T)
    // depends on accidental row order (QBReadStats.R:139) — we pin a
    // deterministic first via a row_number window whose ordering chain is
    // total ((l_orderkey, l_linenumber) alone is NOT unique in the data)
    q("p15_dedup_first",
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey,
        |         row_number() OVER (PARTITION BY l_orderkey
        |           ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
      Tables.load(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey")
    },

    // P6 — conjunctive predicates (dropbackType=='TRADITIONAL' &
    // unblockedPressure==0 — QBReadStats.R:54,96)
    q("p6_conjunctive",
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100 AND user_id % 2 = 0
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value") > 100 &&
                col("user_id") % 2 === 0)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },
  )
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3 — joins (J1-J10) over the synthetic tables.
  *
  * Scale notes: dimension sides (region/nation/part/supplier/customer at
  * TPC-H proportions) are explicitly `broadcast()`-hinted so the fact scan
  * never shuffles for them; fact-fact joins (lineitem⋈orders) shuffle on the
  * join key once, and AQE is free to flip to broadcast when the filtered
  * side collapses. At 100 TB the same plans hold: dims stay broadcastable,
  * fact-fact joins would additionally benefit from bucketing both tables on
  * the order key at write time (noted in the pipeline docs).
  */
object JoinQueries {

  val defs: Seq[QueryDef] = Seq(

    // J1 — left outer equi-join fact⟕fact, the reference workhorse
    // (tracking ⟕ plays — Openness_Data_Frame_Prep.R:8-15)
    q("j1_left_join",
      """SELECT l_orderkey, l_linenumber, o_orderstatus, o_totalprice
        |FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
        .select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // J2 — inner equi-join (merge(by=...) — DataCleaning.R:22)
    q("j2_inner_join",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // J3 — equi-join with differing key names, chained through two dims
    // (nflId = pff_primaryDefensiveCoverageMatchupNflId —
    // Openness_Data_Frame_Prep.R:63)
    q("j3_diff_key_names",
      """SELECT c_custkey, n_name, r_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")
    },

    // J5 — right outer join; left side pre-filtered so some right rows are
    // unmatched and surface nulls (merge(all.y=T) — QBReadStats.R:46-47)
    q("j5_right_join",
      """SELECT p_partkey, l_orderkey, l_quantity
        |FROM (SELECT * FROM lineitem WHERE l_quantity > 49) li
        |RIGHT JOIN part ON l_partkey = p_partkey
        |ORDER BY p_partkey, l_orderkey NULLS FIRST, l_quantity NULLS FIRST""".stripMargin) { (s, dir) =>
      // the filtered left side is small (~2% of lineitem) but post-filter
      // stats are unknown to the planner ⇒ hint it: right-outer + BuildLeft
      // broadcast beats the default sort-merge here
      val li = broadcast(Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 49))
      val p = Tables.load(s, dir, "part")
      li.join(p, li("l_partkey") === p("p_partkey"), "right")
        .select("p_partkey", "l_orderkey", "l_quantity")
        .orderBy(col("p_partkey"), col("l_orderkey").asc_nulls_first,
                 col("l_quantity").asc_nulls_first)
    },

    // J6 — left-semi join (Visualization.R:22)
    q("j6_semi_join",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val big = Tables.load(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // J6b — left-anti join (extension beyond the reference; SURVEY §2.3
    // notes anti joins absent there — we provide them as first-class)
    q("j6b_anti_join",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val big = Tables.load(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      o.join(big, o("o_orderkey") === big("l_orderkey"), "left_anti")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // J7 — self-join on a derived relation (mirror-route match —
    // Matchup Information.R:79-84): nation pairs within the same region
    q("j7_self_join",
      """SELECT a.n_regionkey AS region_key, a.n_name AS nation_a, b.n_name AS nation_b
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
        |ORDER BY region_key, nation_a, nation_b""".stripMargin) { (s, dir) =>
      val n = Tables.load(s, dir, "nation")
      val a = n.as("a")
      val b = n.as("b")
      a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
                col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_regionkey").as("region_key"),
                col("a.n_name").as("nation_a"),
                col("b.n_name").as("nation_b"))
        .orderBy("region_key", "nation_a", "nation_b")
    },

    // J8 — small-dimension broadcast joins + aggregate on top
    // (players/teams dims — QBReadStats.R:138)
    // The revenue sum is accumulated in DECIMAL (exact, order-independent)
    // so partial-aggregation order can't flip a rounding boundary vs the
    // oracle; the per-row product is still computed in double (identical
    // IEEE ops on both engines) before the cast. Terminal CAST to DOUBLE
    // on both sides: a decimal output column cannot hash-match across the
    // driver's readers (arrow keeps Decimal('x.500000'), duckdb.df() gives
    // float x.5), while an exact-decimal-to-double cast is bit-identical.
    q("j8_broadcast_dims",
      """SELECT p_brand, s_name, count(*) AS n_lines,
        |       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |            AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY p_brand, s_name
        |ORDER BY p_brand, s_name""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val sup = Tables.load(s, dir, "supplier")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .groupBy("p_brand", "s_name")
        .agg(count(lit(1)).as("n_lines"),
             sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
               .cast("decimal(18,6)")).cast("decimal(38,6)")
               .cast("double").as("revenue"))
        .orderBy("p_brand", "s_name")
    },

    // J9 — constrained cross product within a group (defender × route-runner
    // per frame — DefPosModel.ipynb:136-140): line pairs within an order
    q("j9_group_cross",
      """SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS line_a,
        |       b.l_linenumber AS line_b,
        |       abs(a.l_extendedprice - b.l_extendedprice) AS price_gap
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
        |ORDER BY l_orderkey, line_a, line_b""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      val a = li.as("a")
      val b = li.as("b")
      a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
                col("a.l_linenumber") < col("b.l_linenumber"))
        .select(col("a.l_orderkey").as("l_orderkey"),
                col("a.l_linenumber").as("line_a"),
                col("b.l_linenumber").as("line_b"),
                abs(col("a.l_extendedprice") - col("b.l_extendedprice")).as("price_gap"))
        .orderBy("l_orderkey", "line_a", "line_b")
    },

    // J10 — per-group scalar lookup joined back onto detail rows
    // (throw_speed lookup — Openness_Data_Frame_Prep.R:90-98)
    q("j10_scalar_lookup",
      """SELECT l.l_orderkey AS l_orderkey, l.l_linenumber AS l_linenumber,
        |       l.l_extendedprice AS l_extendedprice
        |FROM lineitem l
        |JOIN (SELECT l_orderkey, max(l_extendedprice) AS max_price
        |      FROM lineitem GROUP BY l_orderkey) t
        |  ON l.l_orderkey = t.l_orderkey AND l.l_extendedprice = t.max_price
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val maxes = li.groupBy(col("l_orderkey").as("k"))
        .agg(max("l_extendedprice").as("max_price"))
      li.join(maxes, li("l_orderkey") === maxes("k") &&
                     li("l_extendedprice") === maxes("max_price"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // J11 (extension) — full outer join (SURVEY §2.3 lists it absent
    // from the reference; free in Spark): customers vs suppliers by
    // nation, keeping nations present on either side only
    q("j11_full_outer",
      """SELECT n_key, c_cnt, s_cnt FROM (
        |  SELECT coalesce(c.k, s.k) AS n_key, c.c_cnt, s.s_cnt
        |  FROM (SELECT c_nationkey AS k, count(*) AS c_cnt FROM customer
        |        WHERE c_acctbal > 9000 GROUP BY 1) c
        |  FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS s_cnt FROM supplier
        |        WHERE s_acctbal > 9000 GROUP BY 1) s
        |    ON c.k = s.k)
        |ORDER BY n_key""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("c_cnt"))
      val su = Tables.load(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("k2")).agg(count(lit(1)).as("s_cnt"))
      c.join(su, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("n_key"), col("c_cnt"), col("s_cnt"))
        .orderBy("n_key")
    },

    // J12 (extension) — AS-OF join: each purchase matched to the user's
    // latest prior-or-simultaneous click (graft.operators.AsOfJoin:
    // union + ordered-window formulation, one shuffle, no range-join
    // explosion). Oracle: DuckDB's native ASOF LEFT JOIN.
    q("j12_asof_join",
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
      graft.operators.AsOfJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
        .select(col("event_id").as("purchase_id"),
                col("asof_event_id").as("click_id"),
                (unix_micros(col("ts")) - unix_micros(col("asof_ts"))).as("gap_us"))
        .orderBy("purchase_id")
    },

    // J13 (extension) — bounded RANGE join via bucketed equi-join
    // (graft.operators.RangeJoin): every same-user event in the hour
    // before each purchase. A raw BETWEEN condition would plan as a
    // nested-loop; the bucket probe keeps it an equi-join.
    q("j13_range_join",
      """SELECT p.event_id AS purchase_id, e.event_id AS prior_event_id,
        |       e.event_type AS prior_type
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN events e
        |  ON e.user_id = p.user_id
        | AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts <= p.ts
        | AND e.event_id <> p.event_id
        |ORDER BY purchase_id, prior_event_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
      graft.operators.RangeJoin.within(purchases, ev, Seq("user_id"), "ts", "ts", 3600L)
        .filter(col("r_event_id") =!= col("event_id"))
        .select(col("event_id").as("purchase_id"),
                col("r_event_id").as("prior_event_id"),
                col("r_event_type").as("prior_type"))
        .orderBy("purchase_id", "prior_event_id")
    },

    // J4 — left join with a renamed key plus equality on non-key attrs
    // (left_join(by=c("routeRan","pff_...","firstRead"="secondId")) —
    // BuildingReadOrder.R:139): lookup keyed by (flag, status, renamed key)
    q("j4_renamed_key_join",
      """SELECT l.l_orderkey AS l_orderkey, l.l_linenumber AS l_linenumber,
        |       l.l_partkey AS l_partkey, t.grp_qty AS grp_qty
        |FROM lineitem l
        |LEFT JOIN (SELECT l_returnflag AS flag, l_linestatus AS status,
        |                  l_partkey AS pkey, round(sum(l_quantity), 2) AS grp_qty
        |           FROM lineitem GROUP BY 1, 2, 3) t
        |  ON l.l_returnflag = t.flag AND l.l_linestatus = t.status
        |     AND l.l_partkey = t.pkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, grp_qty""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val lookup = li.groupBy(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"), col("l_partkey").as("pkey"))
        .agg(round(sum("l_quantity"), 2).as("grp_qty"))
      li.join(lookup,
          li("l_returnflag") === lookup("flag") &&
          li("l_linestatus") === lookup("status") &&
          li("l_partkey") === lookup("pkey"), "left")
        .select(li("l_orderkey"), li("l_linenumber"), li("l_partkey"), col("grp_qty"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "grp_qty")
    },

    // J14 — event-time interval join: each view matched to the same
    // user's purchases inside [view_ts, view_ts + 2 h). Batch twin of
    // the watermarked stream-stream join (StreamOps.viewPurchaseJoin —
    // the exact same code path; withWatermark is a no-op on batch), so
    // the oracle here also certifies the streaming result via the
    // stream≡batch spec. Plan: equi-join on user_id with the range
    // bound as join residual — never a nested-loop. Small filtered
    // sides broadcast (zero shuffles, see EXPLAIN.md); past the
    // broadcast threshold it is a SortMergeJoin with one shuffle per
    // side.
    q("j14_interval_join",
      """SELECT v.user_id AS user_id, v.event_id AS view_id,
        |       p.event_id AS purchase_id, v.ts AS view_ts,
        |       p.ts AS purchase_ts, round(p.value, 2) AS purchase_value
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 2 HOUR
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      graft.streaming.StreamOps.viewPurchaseJoin(
          e.filter(col("event_type") === "view"),
          e.filter(col("event_type") === "purchase"))
        .orderBy("view_id", "purchase_id")
    },

    // J15 — explicit salted skew join (operators.SaltedJoin): lineitem
    // keyed on l_returnflag (3 distinct values, one holding ~half the
    // rows — the static-skew worst case) against per-flag stats. The
    // salt spreads the hot flag over 8 reducers; the result is
    // salt-invariant, so the oracle is the plain join. This is the
    // AQE-less/streaming path; batch plans under Graft.session() get
    // the same protection from the AQE skew-join split.
    q("j15_salted_skew_join",
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, f.n_flag
        |FROM lineitem l
        |JOIN (SELECT l_returnflag, count(*) AS n_flag
        |      FROM lineitem GROUP BY 1) f
        |  ON l.l_returnflag = f.l_returnflag
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
      val stats = li.groupBy("l_returnflag").agg(count(lit(1)).as("n_flag"))
      graft.operators.SaltedJoin.inner(
          li.select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"),
          stats, Seq("l_returnflag"),
          saltBy = col("l_orderkey"), salts = 8)
        .select("l_orderkey", "l_linenumber", "l_partkey", "n_flag")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    },

    // J16 — bloom-pruned semi join (operators.BloomPrune): lineitem
    // against the selective set of urgent high-value orders. The Bloom
    // filter drops ~97% of lineitem MAP-SIDE before the semi join's
    // shuffle; false positives are removed by the exact semi join, so
    // the oracle is the plain IN-subquery. The manual form of runtime
    // row-level filtering, for when selectivity is known to the caller
    // but not provable by the optimizer.
    q("j16_bloom_semi",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |                     WHERE o_orderpriority = '1-URGENT'
        |                       AND o_totalprice > 200000)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin) { (s, dir) =>
      val li = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      val sel = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
      graft.operators.BloomPrune.semiJoin(li, "l_orderkey", sel, "o_orderkey",
          expectedItems = 100000L)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    },

    // J17 — edit-distance similarity self-join (string near-dup): all
    // customer-name pairs within levenshtein <= 1. Short templated keys →
    // the deletion-neighbourhood path (operators/EditDistanceJoin
    // .deletionSelfJoin; 0.98M candidates at sf0.1 vs 10.4M for gram
    // blocking — see the operator scaladoc for the crossover to the
    // Ed-Join prefix filter on long strings). The oracle is the
    // brute-force quadratic join — the same oracle-of-record pattern as
    // d2/v2: at scale you run the filtered join, never the cross join.
    // Dist is exact on both sides, so the hash check proves the candidate
    // generator lost nothing.
    q("j17_editdist_join",
      """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
        |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_custkey < b.c_custkey
        | AND abs(len(a.c_name) - len(b.c_name)) <= 1
        | AND levenshtein(a.c_name, b.c_name) <= 1
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
      graft.operators.EditDistanceJoin
        .deletionSelfJoin(c, "c_custkey", "c_name", k = 1)
        .orderBy("a_id", "b_id")
    },

    // J18 — edit-distance self-join on LONG strings (documents, 48-553
    // chars): the Ed-Join q-gram prefix-filter path (operators/
    // EditDistanceJoin.selfJoin), the documented long-string scale path
    // past the deletion-neighbourhood crossover at len ≈ 10³ᐟᵏ (j17's
    // short-key path would generate O(len^k) variants per doc — absurd
    // at len 500, k 8). Rarest-first prefix tokens keep candidate
    // buckets tight even though every doc shares common bigrams. Oracle
    // is the brute-force quadratic join (oracle-of-record pattern, d2/
    // v2/j17); the single levenshtein per banded pair lives in a CTE so
    // the oracle pays ONE O(n·m) DP per pair. Exact dist on both sides
    // proves the prefix filter + short-bucket union lost nothing.
    q("j18_editdist_docs",
      """WITH p AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |         levenshtein(a.text, b.text) AS d
        |  FROM documents a JOIN documents b
        |    ON a.doc_id < b.doc_id
        |   AND abs(len(a.text) - len(b.text)) <= 8)
        |SELECT a_id, b_id, CAST(d AS BIGINT) AS dist
        |FROM p WHERE d <= 8 ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select("doc_id", "text")
      graft.operators.EditDistanceJoin
        .selfJoin(d, "doc_id", "text", k = 8, q = 2)
        .orderBy("a_id", "b_id")
    },

    // J19 — grid-bucketed spatial distance join (round 7): all event
    // pairs within Euclidean distance 2 on the synthetic (x, y) plane
    // (f2's coordinate derivation) — the JOIN form of f18's scalar
    // within_dist filter, i.e. "defenders within r yards of the
    // receiver" as a set-to-set operator. operators/GridJoin: cell =
    // (⌊x/d⌋, ⌊y/d⌋), probe explodes the 3×3 neighborhood, index keys
    // its own cell once, candidates are ONE equi-join on the cell key
    // (lossless, no distinct needed — each pair collides exactly once),
    // exact distance verify map-side. The oracle is the banded
    // quadratic join over the same fixed event_id < 5000 slice (the
    // k1/k2 bounded-slice precedent keeps the oracle affordable at
    // every sf).
    q("j19_grid_join",
      """WITH p AS (
        |  SELECT event_id, value % 100 AS x, (value * 7) % 50 AS y
        |  FROM events WHERE event_id < 5000)
        |SELECT a.event_id AS a_id, b.event_id AS b_id,
        |       round(sqrt((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)), 4) AS dist
        |FROM p a JOIN p b
        |  ON a.event_id < b.event_id
        | AND abs(a.x - b.x) <= 2 AND abs(a.y - b.y) <= 2
        | AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 4.0
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val p = Tables.load(s, dir, "events")
        .filter(col("event_id") < 5000)
        .select(col("event_id"),
          (col("value") % 100).as("x"), ((col("value") * 7) % 50).as("y"))
      graft.operators.GridJoin.selfJoin(p, "event_id", "x", "y", d = 2.0)
        .orderBy("a_id", "b_id")
    },
  )
}

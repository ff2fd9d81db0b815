package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — window functions / ordered & positional ops (W1-W11).
  *
  * Scale notes: every window below partitions by a high-cardinality key
  * (user_id / orderkey), so WindowExec sorts within shuffle partitions and
  * never concentrates data on one task. Nothing uses a global window except
  * w7/w8 (global rank), which at 100 TB would be replaced by the
  * `orderBy().limit(k)` top-k pattern Spark executes as partial top-k +
  * single-reduce merge — w8 demonstrates exactly that plan.
  * Ordering chains always end in a unique column (event_id / orderkey) —
  * the reference relies on accidental input order for ties (SURVEY §7.4.1);
  * we pin determinism explicitly.
  */
object WindowQueries {

  val defs: Seq[QueryDef] = Seq(

    // W1 — dense_rank within group (secondId — radius_model.R:257-261)
    q("w1_dense_rank",
      """SELECT event_id, user_id,
        |       dense_rank() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS tick
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("tick",
          (dense_rank().over(Window.partitionBy("user_id").orderBy("ts")) - 1)
            .cast("long"))
        .select("event_id", "user_id", "tick")
        .orderBy("event_id")
    },

    // W2 — row_number in a conditional custom order (read order by ±y —
    // BuildingReadOrder.R:148-157); unique tie-break appended
    q("w2_row_number_custom",
      """SELECT event_id, user_id,
        |       row_number() OVER (PARTITION BY user_id
        |         ORDER BY CASE WHEN event_type = 'purchase' THEN -value
        |                       ELSE value END, event_id) AS pos
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("pos", row_number().over(
          Window.partitionBy("user_id")
            .orderBy(when(col("event_type") === "purchase", -col("value"))
                       .otherwise(col("value")),
                     col("event_id"))).cast("long"))
        .select("event_id", "user_id", "pos")
        .orderBy("event_id")
    },

    // W3 — group-wise running sum (cumulative QB distance —
    // BuildingReadOrder.R:88-94). Accumulates in DECIMAL: window-agg
    // association order differs between engines on doubles. Terminal
    // CAST to DOUBLE on both sides — decimal output columns cannot
    // hash-match across the driver's readers (arrow Decimal vs duckdb.df()
    // float); the exact-decimal-to-double cast is bit-identical.
    q("w3_running_sum",
      """SELECT event_id, user_id,
        |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (
        |         PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DECIMAL(38,6)) AS DOUBLE) AS running_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("running_value",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("decimal(38,6)")
            .cast("double"))
        .select("event_id", "user_id", "running_value")
        .orderBy("event_id")
    },

    // W4 — conditional positional min (first frame where cumulative distance
    // crosses the dropback distance — BuildingReadOrder.R:97-106): first
    // purchase timestamp per user, broadcast to all the user's rows
    q("w4_conditional_min",
      """SELECT event_id, user_id,
        |       min(CASE WHEN event_type = 'purchase' THEN ts END)
        |         OVER (PARTITION BY user_id) AS first_purchase_ts
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("first_purchase_ts",
          min(when(col("event_type") === "purchase", col("ts")))
            .over(Window.partitionBy("user_id")))
        .select("event_id", "user_id", "first_purchase_ts")
        .orderBy("event_id")
    },

    // W5 — group max as filter (outside receivers y==min|max —
    // BuildingReadOrder.R:132-137): each user's highest-value events
    q("w5_max_filter",
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value,
        |         max(value) OVER (PARTITION BY user_id) AS mx
        |  FROM events) WHERE value = mx
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("mx", max("value").over(Window.partitionBy("user_id")))
        .filter(col("value") === col("mx"))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    },

    // W6 — top-1 per group with pinned tie-break (slice_max —
    // QBReadStats.R:182-184)
    q("w6_top1_per_group",
      """SELECT user_id, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(desc("value"), col("event_id"))))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "value")
        .orderBy("user_id")
    },

    // W7 — global sort with a global position (arrange/ORDER BY —
    // QBReadStats.R:231). No single-partition Window: GlobalRank does a
    // range-partitioned parallel sort + per-partition offsets
    // (zipWithIndex), so the plan survives 100× the rows.
    q("w7_global_rank",
      """SELECT o_orderkey, o_totalprice,
        |       row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |FROM orders ORDER BY rnk""".stripMargin) { (s, dir) =>
      graft.operators.GlobalRank.withGlobalRank(
          Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          "rnk", desc("o_totalprice"), col("o_orderkey"))
        .orderBy("rnk")
    },

    // W8 — top-k plus an offset slice (top-10 QBs + rows 24-33 —
    // QBReadStats.R:230-246). orderBy().limit(33) compiles to
    // TakeOrderedAndProject (parallel partial top-k per partition, tiny
    // merge on the driver); only the 33 survivors see a window.
    q("w8_topk_offset",
      """SELECT o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 10 OR rnk BETWEEN 24 AND 33
        |ORDER BY rnk""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(33)
        .withColumn("rnk", row_number().over(
          Window.orderBy(desc("o_totalprice"), col("o_orderkey"))).cast("long"))
        .filter(col("rnk") <= 10 || col("rnk").between(24, 33))
        .orderBy("rnk")
    },

    // W9 — event-anchored time window (ball-flight frames after
    // pass_forward; pre-snap [line_set, snap-2s] — Openness_Data_Frame_
    // Prep.R:71-74, DefPosModel.ipynb:72-103). Anchor = first signup per
    // user; keep events within 2 minutes after it. Fixes the reference's
    // cross-play-bleed: the anchor window is strictly per-group.
    q("w9_anchored_window",
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT event_id, user_id, event_type, ts,
        |         min(CASE WHEN event_type = 'signup' THEN ts END)
        |           OVER (PARTITION BY user_id) AS anchor
        |  FROM events)
        |WHERE anchor IS NOT NULL
        |  AND ts >= anchor AND ts <= anchor + INTERVAL 2 MINUTE
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("anchor",
          min(when(col("event_type") === "signup", col("ts")))
            .over(Window.partitionBy("user_id")))
        .filter(col("anchor").isNotNull &&
                col("ts") >= col("anchor") &&
                col("ts") <= col("anchor") + expr("INTERVAL 2 MINUTES"))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // W10 — cyclic label assignment (defender #1-11 via rep(1:11) —
    // Openness_Data_Frame_Prep.R:34-36): deterministic row_number modulo,
    // not order-dependent recycling
    q("w10_cyclic_label",
      """SELECT event_id, user_id,
        |       ((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |         - 1) % 3) + 1 AS slot
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("slot",
          ((((row_number().over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            - 1) % 3) + 1).cast("long")))
        .select("event_id", "user_id", "slot")
        .orderBy("event_id")
    },

    // W11 — index adjusted to group min (adj_time = frame - min(frame) —
    // BuildingReadOrder.R:108-122): microseconds since the user's first event
    q("w11_adjusted_index",
      """SELECT event_id, user_id,
        |       epoch_us(ts) - epoch_us(min(ts) OVER (PARTITION BY user_id)) AS us_since_first
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .withColumn("us_since_first",
          unix_micros(col("ts")) -
            unix_micros(min("ts").over(Window.partitionBy("user_id"))))
        .select("event_id", "user_id", "us_since_first")
        .orderBy("event_id")
    },

    // W12 — tumbling event-time window aggregation (the batch twin of the
    // Structured Streaming pipeline in graft.streaming; window() is the
    // operator a live 10 Hz tracking feed would run under a watermark)
    q("w12_tumbling_window",
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total"))
        .orderBy("win_start", "event_type")
    },

    // W13 — session windows (30-min inactivity gap) — session_window in
    // Spark vs the gaps-and-islands formulation in SQL. Spark sessions are
    // half-open [start, last+gap), so a row landing exactly on the close
    // boundary opens a NEW session ⇒ the SQL break condition is >=, not >.
    q("w13_session_window",
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                     + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
        |       round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
                col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")
    },

    // W14 — gap sessionization via flatMapGroupsWithState CUSTOM state
    // (graft.streaming.StreamOps.gapSessions; streaming twin asserted in
    // StreamOpsSpec). Closed-session semantics: an event exactly at
    // last + gap EXTENDS the session (<=), unlike session_window's
    // half-open close — hence the strict > in the oracle's break.
    q("w14_gap_sessions",
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                     + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts, value,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |       count(*) AS n_events,
        |       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
        |         AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
      graft.streaming.StreamOps.gapSessions(
          Tables.load(s, dir, "events"), gapMinutes = 30, emitOpen = true)
        .toDF()
        .orderBy("user_id", "session_start")
    },

    // W15 — per-group top-k via GroupTopK's map-side partial selection
    // (the grouped TakeOrderedAndProject; see operators.GroupTopK for
    // the shuffle-volume argument). Oracle is the window formulation —
    // results must be identical.
    q("w15_group_topk",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin) { (s, dir) =>
      graft.operators.GroupTopK.topK(
          Tables.load(s, dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          groupCols = Seq("o_orderpriority"), sortCol = "o_totalprice",
          tieCol = "o_orderkey", k = 3)
        .orderBy("o_orderpriority", "rnk")
    },

    // W16 — the same per-group top-k as a NATIVE Catalyst operator:
    // GroupTopKPlan logical node → GroupTopKStrategy → partial/final
    // exec pair (SURVEY §7.3 case (c); graft.plans.GroupTopKPlan).
    // Identical oracle — both formulations must agree exactly.
    q("w16_group_topk_native",
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders)
        |WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""".stripMargin) { (s, dir) =>
      graft.operators.GroupTopK.topKNative(
          Tables.load(s, dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          groupCols = Seq("o_orderpriority"), sortCol = "o_totalprice",
          tieCol = "o_orderkey", k = 3)
        .orderBy("o_orderpriority", "rnk")
    },

    // W17 — ordered-event funnel: users progressing view → click →
    // purchase, each stage strictly after the previous user's stage
    // time. Three per-user min-aggregations chained by time-bounded
    // joins — every stage is a key-partitioned agg + equi-join, no
    // window over the full event stream and no per-user UDAF.
    q("w17_funnel",
      """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
        |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
        |      WHERE e.event_type = 'click' GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_buy FROM events e
        |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = e.filter(col("event_type") === "click").as("e")
        .join(v, col("e.user_id") === v("user_id") && col("e.ts") > col("t_view"))
        .groupBy(col("e.user_id")).agg(min("e.ts").as("t_click"))
      val p = e.filter(col("event_type") === "purchase").as("e2")
        .join(c, col("e2.user_id") === c("user_id") && col("e2.ts") > col("t_click"))
        .groupBy(col("e2.user_id")).agg(min("e2.ts").as("t_buy"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    },

    // W19 — distribution-position windows: percent_rank (rank scaled to
    // [0,1]) and cume_dist (CDF position) per group — the normalization
    // behind percentile features and calibration curves. Both engines
    // define them identically; ties share positions, so the unique
    // tie-broken ordering keeps the result deterministic.
    q("w19_percent_rank",
      """SELECT o_orderkey, o_orderpriority,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      Tables.load(s, dir, "orders")
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .select("o_orderkey", "o_orderpriority", "pr", "cd")
        .orderBy("o_orderkey")
    },

    // W20 — value-position windows: first/last/nth value over an
    // explicit full-partition frame (last_value under the DEFAULT frame
    // is the running current row — the classic silent-wrong-answer;
    // both engines get the full frame spelled out), plus offset
    // lead/lag with defaults.
    q("w20_value_windows",
      """SELECT event_id, user_id,
        |       first_value(event_id) OVER w AS first_ev,
        |       last_value(event_id) OVER w AS last_ev,
        |       nth_value(event_id, 2) OVER w AS second_ev,
        |       lag(event_id, 1, -1) OVER (PARTITION BY user_id
        |                                  ORDER BY ts, event_id) AS prev_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val full = ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "events")
        .withColumn("first_ev", first("event_id").over(full))
        .withColumn("last_ev", last("event_id").over(full))
        .withColumn("second_ev", nth_value(col("event_id"), 2).over(full))
        .withColumn("prev_ev", lag(col("event_id"), 1, -1L).over(ordered))
        .select("event_id", "user_id", "first_ev", "last_ev", "second_ev", "prev_ev")
        .orderBy("event_id")
    },

    // W18 — time-based sliding RANGE window: per-user rolling
    // 10-minute event count + exact-decimal sum, keyed on EVENT TIME
    // (a RANGE frame over epoch seconds — peers join by time distance,
    // not row position; W3's ROWS frame can't express this). The rate/
    // burst signal behind throttling and anomaly detection. Partitioned
    // by user — never a global window; at 100 TB the frame bound keeps
    // per-row state O(events in 10 min), independent of history length.
    q("w18_time_range_window",
      """SELECT event_id, user_id,
        |       count(*) OVER w AS n_10m,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_10m
        |FROM events
        |-- floor to whole seconds: DuckDB epoch() keeps the microsecond
        |-- fraction, Spark's timestamp→long cast floors
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-600, Window.currentRow)
      Tables.load(s, dir, "events")
        .withColumn("n_10m", count(lit(1)).over(w))
        .withColumn("sum_10m",
          sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
        .select("event_id", "user_id", "n_10m", "sum_10m")
        .orderBy("event_id")
    },

    // W21 — time-series resampling + linear interpolation (gap fill): each
    // user's irregular event stream resampled onto an hourly grid spanning
    // [floor_hour(first event), last event], value lerped between the
    // surrounding observations. The classic align-sensors-to-a-grid op.
    //
    // Shape: grid points and observations are UNIONED and sorted once per
    // user; two frames over that one sort (last-non-null before / first-
    // non-null after) recover the bracketing observations — one shuffle,
    // one sort, no self-join, no per-gridpoint probe. At 100 TB this is the
    // standard gap-fill plan: partition by series key, frames carry O(1)
    // state per row. Epochs are exact micros (unix_micros/epoch_us) and the
    // lerp is one fixed IEEE expression tree, identical on both engines.
    // A grid point landing exactly on an observation sorts after it
    // (is_grid tie-break), so prev_t = t and the lerp factor is exactly 0.
    q("w21_resample_lerp",
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t, value, event_id, 0 AS is_grid
        |  FROM events),
        |span AS (
        |  SELECT user_id, (min(t) // 3600000000) * 3600000000 AS g0, max(t) AS g1
        |  FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(g0, g1, 3600000000)) AS t,
        |         CAST(NULL AS DOUBLE) AS value, CAST(-1 AS BIGINT) AS event_id,
        |         1 AS is_grid
        |  FROM span),
        |u AS (SELECT * FROM ev UNION ALL SELECT * FROM grid),
        |f AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wp AS prev_v,
        |    last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wp AS prev_t,
        |    first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER wn AS next_v,
        |    first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS) OVER wn AS next_t
        |  FROM u
        |  WINDOW
        |    wp AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY user_id ORDER BY t, is_grid, event_id
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, t AS grid_us,
        |  CASE WHEN prev_t IS NULL THEN next_v
        |       WHEN next_t IS NULL THEN prev_v
        |       WHEN next_t = prev_t THEN prev_v
        |       ELSE prev_v + (next_v - prev_v) *
        |            (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
        |  END AS v_interp
        |FROM f WHERE is_grid = 1
        |ORDER BY user_id, grid_us""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("t"),
                col("value"), col("event_id"))
      graft.operators.ResampleLerp.gridLerp(ev, stepUs = 3600L * 1000000L)
        .orderBy("user_id", "grid_us")
    },

    // W22 — sequence pattern matching over ordered event streams
    // (MATCH_RECOGNIZE-lite): each user's events collapse to one ordered
    // initial-letter string (c/e/p/s/v — distinct by construction), and a
    // regex counts non-overlapping view→clicks→purchase funnels plus the
    // position of the first one. Both engines run the same pattern with the
    // same leftmost non-overlapping scan and the same non-greedy prefix
    // trick for the position (regexp_instr exists only on one side).
    //
    // Shape: ONE shuffle (groupBy user) with map-side partial collect;
    // per-key sequences are bounded by per-user event counts — at 100 TB
    // you'd bound them structurally by sessionizing first (w13/w14) and
    // matching within sessions, which is this same query with session_id
    // in the key. collect_list order is pinned by array_sort over
    // (t, event_id, ch) — never relies on arrival order.
    q("w22_seq_pattern",
      """WITH s AS (
        |  SELECT user_id,
        |         string_agg(substring(event_type, 1, 1), ''
        |                    ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |       CAST(length(seq) AS BIGINT) AS seq_len,
        |       CAST(len(regexp_extract_all(seq, 'vc*p')) AS BIGINT) AS n_funnels,
        |       CAST(CASE WHEN len(regexp_extract_all(seq, 'vc*p')) > 0
        |                 THEN length(regexp_extract(seq, '^(.*?)vc*p', 1)) + 1
        |                 ELSE 0 END AS BIGINT) AS first_pos
        |FROM s ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("t"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      val seqs = ev.groupBy("user_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("t"), col("event_id"),
                                                   col("ch")))),
                    x => x.getField("ch")), "").as("seq"))
      seqs.select(col("user_id"),
          length(col("seq")).cast("long").as("seq_len"),
          regexp_count(col("seq"), lit("vc*p")).cast("long").as("n_funnels"),
          when(regexp_count(col("seq"), lit("vc*p")) > 0,
               length(regexp_extract(col("seq"), "^(.*?)vc*p", 1)) + 1)
            .otherwise(0).cast("long").as("first_pos"))
        .orderBy("user_id")
    },

    // W23 — first-order Markov transition matrix over event sequences
    // (the behavioral-model summary w22's pattern matching samples from):
    // per-user lag pairs → global (prev → next) counts and row-normalized
    // probabilities. The probability divides two exact integers, so it
    // hash-matches without rounding. One window per user + a 25-row agg;
    // the row-total join is a broadcast of a #states-row dim.
    q("w23_transition_matrix",
      """WITH t AS (
        |  SELECT event_type AS next,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |c AS (SELECT prev, next, CAST(count(*) AS BIGINT) AS n
        |      FROM t WHERE prev IS NOT NULL GROUP BY prev, next),
        |tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tn FROM c GROUP BY prev)
        |SELECT c.prev, c.next, c.n,
        |       CAST(c.n AS DOUBLE) / CAST(tot.tn AS DOUBLE) AS p
        |FROM c JOIN tot USING (prev)
        |ORDER BY prev, next""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")), col("event_id"))
      val t = Tables.load(s, dir, "events")
        .select(col("event_type").as("next"),
                lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "next").agg(count(lit(1)).as("n"))
      val tot = t.groupBy("prev").agg(sum("n").as("tn"))
      t.join(broadcast(tot), "prev")
        .select(col("prev"), col("next"), col("n"),
                (col("n").cast("double") / col("tn").cast("double")).as("p"))
        .orderBy("prev", "next")
    },

    // W24 — streak detection (round 7): maximal runs of the SAME event
    // type per user, the gaps-and-islands pattern (value-change islands,
    // the complement of w13/w14's time-gap islands): island id =
    // row_number-over-user − row_number-over-(user, type), constant
    // exactly within a maximal same-type run. Runs of length ≥ 3 emit
    // (user, type, streak_len, started, ended). Scale shape: both
    // windows partition by the HIGH-cardinality user key (never global),
    // the island aggregation is an ordinary hash agg on (user, type,
    // grp), and nothing is quadratic — each event contributes one row to
    // each window and one to the agg.
    q("w24_streaks",
      """WITH o AS (
        |  SELECT user_id, event_type, ts,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS ra,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts, event_id) AS rt
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_type, ra - rt AS grp,
        |         count(*) AS streak_len, min(ts) AS started, max(ts) AS ended
        |  FROM o GROUP BY user_id, event_type, ra - rt)
        |SELECT user_id, event_type, streak_len, started, ended
        |FROM g WHERE streak_len >= 3
        |ORDER BY user_id, started, event_type""".stripMargin) { (s, dir) =>
      val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wTyp = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
                row_number().over(wAll).cast("long").as("ra"),
                row_number().over(wTyp).cast("long").as("rt"))
        .groupBy(col("user_id"), col("event_type"),
                 (col("ra") - col("rt")).as("grp"))
        .agg(count(lit(1)).as("streak_len"),
             min("ts").as("started"), max("ts").as("ended"))
        .filter(col("streak_len") >= 3)
        .select("user_id", "event_type", "streak_len", "started", "ended")
        .orderBy("user_id", "started", "event_type")
    },

    // W25 — EWMA + threshold anomaly scan (round 9): per user, the
    // exponentially-weighted moving average of the value stream in
    // (ts, event_id) order with α = 1/4, counting events whose
    // deviation from the RUNNING ewma exceeds the threshold — the
    // monitoring primitive behind drift/anomaly gates on ingest
    // telemetry. A recursive recurrence is inexpressible as a Spark
    // Window (each output feeds the next input), so it runs as the
    // engine's established sorted-sequential-fold shape (BdbQueries
    // PRESS mean, x25's LM folds): one hash agg collects each user's
    // (tus, event_id, x) triples, `aggregate` folds them in sorted
    // order. EXACTNESS is why α = 1/4: both α·x (scaling by 2⁻²,
    // exact) and the single correctly-rounded multiply (3/4)·ewma +
    // add run in the identical sequential order in DuckDB's
    // list_reduce∘list_sort, so ewma/max_dev hash-match without a
    // tolerance. Scale shape: state per user is ONE struct; per-user
    // event counts bound the collected arrays (the d9/x25 argument);
    // the streaming twin of this fold is the flatMapGroupsWithState
    // shape StreamOps.resampleLerp already implements — O(1) state,
    // no per-key array at all.
    q("w25_ewma_anomaly",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id,
        |         CAST(value % 100 AS DOUBLE) AS x
        |  FROM events),
        |seqs AS (
        |  SELECT user_id,
        |         list_transform(
        |           list_sort(list(struct_pack(tus := tus,
        |                                      event_id := event_id, x := x))),
        |           s -> struct_pack(anoms := 0::BIGINT, maxdev := 0.0::DOUBLE,
        |                            n := 1::BIGINT, ewma := s.x)) AS st
        |  FROM e GROUP BY user_id),
        |-- field order is LOAD-BEARING: DuckDB's list_reduce updates a
        |-- struct accumulator field-by-field IN ORDER (measured: a field
        |-- reading acc.ewma after ewma's slot sees the NEW value — the
        |-- first cut had maxdev land on 0.75x the true deviation).
        |-- Writing ewma LAST makes every acc.ewma read see the previous
        |-- state under both in-place and snapshot semantics.
        |folded AS (
        |  SELECT user_id,
        |         list_reduce(st, (acc, el) -> struct_pack(
        |           anoms := acc.anoms + CASE WHEN abs(el.ewma - acc.ewma) > 30.0
        |                                     THEN 1 ELSE 0 END,
        |           maxdev := greatest(acc.maxdev, abs(el.ewma - acc.ewma)),
        |           n := acc.n + 1,
        |           ewma := 0.25 * el.ewma + 0.75 * acc.ewma)) AS f
        |  FROM seqs)
        |-- RAW doubles, deliberately un-rounded: the fold is bit-exact
        |-- across engines, and round(x, 6) is the only non-portable op
        |-- here (a half-way binary double rounded through Spark's
        |-- BigDecimal HALF_UP vs DuckDB's round disagreed in the last
        |-- digit at sf0.1) — with exact values the exact compare is
        |-- strictly stronger than a rounded one
        |SELECT user_id, f.n AS n_events, f.ewma AS ewma_final,
        |       f.anoms AS anomalies, f.maxdev AS max_dev
        |FROM folded ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
                col("event_id"), (col("value") % 100).cast("double").as("x"))
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("tus"), col("event_id"),
                                            col("x")))).as("seq"))
        // same fold as the oracle: the first element seeds the state
        // (DuckDB list_reduce semantics), replicated here with an
        // explicit init flag — after element 1 both engines hold
        // (ewma=x₁, anoms=0, maxdev=0, n=1), then identical steps
        .select(col("user_id"), expr(
          """aggregate(seq,
            |  named_struct('ewma', CAST(0.0 AS DOUBLE), 'anoms', CAST(0 AS BIGINT),
            |               'maxdev', CAST(0.0 AS DOUBLE), 'n', CAST(0 AS BIGINT)),
            |  (acc, e) -> IF(acc.n = 0,
            |    named_struct('ewma', e.x, 'anoms', CAST(0 AS BIGINT),
            |                 'maxdev', CAST(0.0 AS DOUBLE), 'n', CAST(1 AS BIGINT)),
            |    named_struct(
            |      'ewma', 0.25D * e.x + 0.75D * acc.ewma,
            |      'anoms', acc.anoms + IF(abs(e.x - acc.ewma) > 30.0D,
            |                              CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
            |      'maxdev', greatest(acc.maxdev, abs(e.x - acc.ewma)),
            |      'n', acc.n + CAST(1 AS BIGINT))))""".stripMargin).as("f"))
        .select(col("user_id"), col("f.n").as("n_events"),
          col("f.ewma").as("ewma_final"),
          col("f.anoms").as("anomalies"),
          col("f.maxdev").as("max_dev"))
        .orderBy("user_id")
    },
  )
}

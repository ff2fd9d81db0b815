package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY.md §2.1 — sources & sinks (S1-S9): CSV scan with explicit
  * schema, glob scan of a file family, overwrite/append write modes,
  * parquet stage checkpoints, partitioned writes with partition pruning,
  * and PK-uniqueness data-quality checks.
  *
  * Each query WRITES to a scratch dir then reads its own output back, so
  * the oracle (plain SQL over the original table) also proves the
  * round-trip is lossless. Scratch dirs are per-(query, sfDir) so
  * concurrent verify/bench runs don't collide.
  *
  * Scale notes: all writes go through Spark's committer — partition-
  * parallel, no driver bottleneck; `repartition(n)` stands in for the
  * reference's 300k-row chunked-transaction ingest (S5). Partitioned
  * parquet + filter ⇒ partition pruning at the scan (S8/P11 at 100 TB:
  * partition by the join/filter key, prune to one directory).
  */
object SourceQueries {

  private def scratch(s: SparkSession, dir: String, name: String): String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_${name}_${dir.hashCode.toHexString}"
    base
  }

  val defs: Seq[QueryDef] = Seq(

    // S1 + S9 — CSV sink then CSV scan with EXPLICIT schema (inference is
    // nondeterministic at scale; DatabaseCreation.R:14-35 infers, we pin)
    q("s1_csv_roundtrip",
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      val out = scratch(s, dir, "s1")
      Tables.load(s, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
      // INT matches the source parquet's physical type, so the roundtrip
      // is type-identical to the oracle (driver hash is type-aware)
      s.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", "true").csv(out)
        .orderBy("n_nationkey")
    },

    // S2 — glob scan of a file family (tracking_week_*.csv —
    // DatabaseCreation.R:32-36): write two disjoint halves as separate
    // file families, read them back with one glob, no manual union
    q("s2_glob_scan",
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""") { (s, dir) =>
      val out = scratch(s, dir, "s2")
      val r = Tables.load(s, dir, "region").select("r_regionkey", "r_name")
      r.filter(col("r_regionkey") % 2 === 0)
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$out/week_0")
      r.filter(col("r_regionkey") % 2 === 1)
        .write.mode(SaveMode.Overwrite).option("header", "true").csv(s"$out/week_1")
      s.read.schema("r_regionkey INT, r_name STRING")
        .option("header", "true").csv(s"$out/week_*")
        .orderBy("r_regionkey")
    },

    // S3 + S4 — overwrite then append write modes (DatabaseCreation.R:
    // 15-29, 33-36): after one overwrite + one append every key is
    // present exactly twice
    q("s3_write_modes",
      """SELECT r_regionkey, 2 AS n_copies FROM region ORDER BY r_regionkey""") { (s, dir) =>
      val out = scratch(s, dir, "s3")
      val r = Tables.load(s, dir, "region").select("r_regionkey")
      r.write.mode(SaveMode.Overwrite).parquet(out)
      r.write.mode(SaveMode.Append).parquet(out)
      s.read.parquet(out)
        .groupBy("r_regionkey").agg(count(lit(1)).cast("int").as("n_copies"))
        .orderBy("r_regionkey")
    },

    // S8 — materialized stage checkpoint (cleaned_player_data →
    // Openness_Data_Frame_Prep.R:101): write an aggregate stage to
    // parquet, read it back, continue the pipeline from the checkpoint
    q("s8_stage_checkpoint",
      """SELECT o_orderpriority, round(sum(total), 2) AS grand
        |FROM (SELECT o_orderpriority, o_custkey, sum(o_totalprice) AS total
        |      FROM orders GROUP BY 1, 2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val out = scratch(s, dir, "s8")
      Tables.load(s, dir, "orders")
        .groupBy("o_orderpriority", "o_custkey")
        .agg(sum("o_totalprice").as("total"))
        .write.mode(SaveMode.Overwrite).parquet(out)
      s.read.parquet(out)
        .groupBy("o_orderpriority")
        .agg(round(sum("total"), 2).as("grand"))
        .orderBy("o_orderpriority")
    },

    // S8b/P11 — hive-partitioned write + partition-pruned read (the
    // gameId-partitioned layout that makes single-play lookups O(1 dir)):
    // only the l_returnflag=R directory is scanned on read-back
    q("s9_partitioned_prune",
      """SELECT l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val out = scratch(s, dir, "s9")
      Tables.load(s, dir, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("l_returnflag").parquet(out)
      s.read.parquet(out)
        .filter(col("l_returnflag") === "R") // prunes to one partition dir
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("l_linestatus")
    },

    // S10 (scale path) — bucketed tables: both sides of a recurring join
    // written bucketed on the join key ⇒ the join plans with NO shuffle
    // Exchange (asserted in SourceQueriesSpec). At 100 TB this converts
    // every repeated lineitem⋈orders into a zero-shuffle map-side join —
    // the single biggest cost lever for a star-schema workload.
    q("s10_bucketed_join",
      """SELECT o_orderkey, o_orderpriority, count(*) AS n_lines,
        |       round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val suffix = math.abs(dir.hashCode).toHexString
      val (ordersT, liT) = (s"orders_bkt_$suffix", s"lineitem_bkt_$suffix")
      // the warehouse directory outlives the in-memory catalog across
      // JVMs: drop the catalog entry AND clear any orphaned location
      Seq(ordersT, liT).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(loc)
        }
      }
      Tables.load(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .write.mode(SaveMode.Overwrite).bucketBy(8, "o_orderkey").saveAsTable(ordersT)
      Tables.load(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .write.mode(SaveMode.Overwrite).bucketBy(8, "l_orderkey").saveAsTable(liT)
      // disable broadcast so the bucket co-location (not broadcast) is
      // what eliminates the exchange — mirrors the at-scale case where
      // neither side fits in memory
      s.table(ordersT).hint("merge")
        .join(s.table(liT).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("o_orderkey")
    },

    // S6 — PK/FK declarations become assertable data-quality checks:
    // count of duplicated primary keys (expected 0) per table, emitted as
    // rows so the check is itself a query
    q("s6_pk_uniqueness",
      """SELECT 'orders' AS tbl,
        |       (SELECT count(*) FROM
        |         (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS n_dup_keys
        |UNION ALL
        |SELECT 'part', (SELECT count(*) FROM
        |  (SELECT p_partkey FROM part GROUP BY p_partkey HAVING count(*) > 1))
        |ORDER BY tbl""".stripMargin) { (s, dir) =>
      def dups(t: String, key: String): DataFrame =
        Tables.load(s, dir, t).groupBy(key).count().filter(col("count") > 1)
          .agg(count(lit(1)).as("n_dup_keys"))
          .select(lit(t).as("tbl"), col("n_dup_keys"))
      dups("orders", "o_orderkey").unionByName(dups("part", "p_partkey"))
        .orderBy("tbl")
    },

    // S10 — HTML leaderboard sink (QBReadStats.R:229-258): top-10 +
    // rows-24-33 tables side by side, saved as one HTML file, emitted
    // as (section, html) rows. The reduce (orderBy + limit) runs
    // distributed; only 33 rows reach the renderer. rows-only: HTML
    // strings aren't a DuckDB-comparable relation; structure is
    // asserted in HtmlSinkSpec.
    QueryDef.qRowsOnly("s11_html_sink") { (s, dir) =>
      import graft.sources.HtmlSink
      // cache: the two renderTable collects below would otherwise each
      // re-run the global top-33 reduction
      val ranked = Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(33)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("o_totalprice"), col("o_orderkey"))))
        .cache()
      val top = HtmlSink.renderTable(
        ranked.filter(col("rnk") <= 10), "Top 10 Orders")
      val bottom = HtmlSink.renderTable(
        ranked.filter(col("rnk").between(24, 33)), "Orders 24-33")
      val html = HtmlSink.document(HtmlSink.sideBySide(Seq(top, bottom)))
      HtmlSink.write(s, html, s"${scratch(s, dir, "s11")}/leaderboard.html")
      import s.implicits._
      Seq(("top10", top), ("rows24_33", bottom), ("combined", html))
        .toDF("section", "html").orderBy("section")
    },

    // S12 — custom DataSource V2 provider (graft.sources.BdbMiniSource):
    // per-game input partitions, EqualTo(gameId) pushdown prunes whole
    // splits, column pruning reaches the reader. rows-only: the table
    // is the generated fixture; parity + pushdown asserted in
    // BdbMiniSourceSpec.
    QueryDef.qRowsOnly("s12_dsv2_source") { (s, _) =>
      s.read.format("graft-bdb").option("table", "tracking").load()
        .filter(col("gameId") === 2022090800L) // pushed: 1 of 2 splits read
        .groupBy("club")
        .agg(count(lit(1)).as("n"), round(avg("s"), 6).as("avg_speed"))
        .orderBy("club")
    },
  )
}

package graft

import org.apache.spark.sql.DataFrame

/** SQL-surface parity (SURVEY §2.1 S7): for every oracle whose SQL is
  * ANSI-portable, running THAT SAME TEXT through `spark.sql` over the
  * registered views must reproduce the DataFrame-API result — the
  * engine is one surface, not two. Oracles using DuckDB dialect
  * (len/string_split/epoch_us/`//`/list_* etc.) are excluded; they are
  * covered by the DuckDB gate instead.
  */
class SqlParitySpec extends SparkSpec {

  // oracles whose text parses and evaluates identically in Spark SQL
  // (excluded by test: a4_flag_ratio and a14_freq_pct render rounded ratios differently,
  // r10_recode's string-to-int cast is rejected under Spark ANSI — both
  // stay covered by the DuckDB gate)
  private val portable = Seq(
    "j1_left_join", "j2_inner_join", "j3_diff_key_names", "j5_right_join",
    "j6_semi_join", "j6b_anti_join", "j7_self_join", "j8_broadcast_dims",
    "j11_full_outer", "j14_interval_join",
    "p1_project", "p4_filter_eq", "p5_col_compare", "p6_conjunctive",
    "p7_in_set", "p8_null_filter", "p9_range", "p13_case_ladder",
    "p14_distinct",
    "a1_avg_group", "a3_count", "a5_multi_stat", "a6_minmax_ts",
    "a13_count_distinct", "a16_global_scalars",
    "w1_dense_rank", "w2_row_number_custom", "w3_running_sum",
    "w4_conditional_min", "w5_max_filter", "w6_top1_per_group",
    "w15_group_topk", "w16_group_topk_native", "w17_funnel",
    "a10_share_of_total", "a19_rollup",
    "a21_cube", "a22_group_zscore",
    "p2_rename", "p11_key_lookup", "p12_derived", "p15_dedup_first",
    "r1_union_all", "r6_na_fill", "r11_intersect",
    "r12_except", "f13_clamp",
    "j9_group_cross", "j10_scalar_lookup",
    "s13_upsert_merge", "s16_snapshot_diff", "s17_incremental_agg",
    "x10_hash_sample",
    "j16_bloom_semi", "s18_zorder_skip", "s19_scd2",
    "s20_schema_evolution", "s21_compaction", "s22_corrupt_tolerance",
    "w19_percent_rank", "w20_value_windows")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("portable oracle SQL through spark.sql matches the DataFrame API") {
    Tables.registerAll(spark, sfDir)
    val failures = portable.flatMap { name =>
      try {
        val sql = SparkEntry.oracleSql(name)
        val viaSql = canon(spark.sql(sql))
        val viaDf = canon(SparkEntry.queries(name)(spark, sfDir))
        if (viaSql == viaDf) None
        else Some(s"$name: result mismatch (${viaSql.size} vs ${viaDf.size} rows)")
      } catch {
        // getMessage may be null (wrapped SparkThrowables) — never let
        // the reporter itself throw and mask the remaining queries
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
          Some(s"$name: ${msg.linesIterator.toSeq.headOption.getOrElse(msg)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}

package graft.queries

import graft.QueryDef
import graft.QueryDef.qRowsOnly
import graft.bdb._

/** SURVEY.md §3.1 entry point A as registered queries: the full
  * prep → openness → read-order → PRESS pipeline and the matchup
  * analysis, running on the deterministic BdbMini fixture (the sfDir
  * tables carry no tracking data; the pipeline is the reference's
  * domain product and is exercised end to end here + golden-tested in
  * PipelineSpec). rows-only: the multi-stage kernel pipeline is not
  * SQL-expressible.
  */
object BdbQueries {

  val defs: Seq[QueryDef] = Seq(

    // Stages 2+3+4+5: cleaned_player_data → openness → timing/reads →
    // per-QB PRESS leaderboard (press_data, FIXTURES.md §3)
    qRowsOnly("bdb_press_pipeline") { (s, _) =>
      val (_, plays, players, playerPlay, tracking) = BdbMini.load(s)
      val timing = ReadOrder.dropbackTiming(tracking, plays, players)
      val reads = ReadOrder.readsData(tracking, playerPlay)
      val throws = QBMetrics.throwScoring(plays, playerPlay, timing, reads)
      QBMetrics.press(throws, playerPlay, players)
        .orderBy("qb_nflId")
    },

    // Stages 2+3: openness scoring with secondId (radius_data)
    qRowsOnly("bdb_radius_stage") { (s, _) =>
      val (_, plays, _, playerPlay, tracking) = BdbMini.load(s)
      val cleaned = OpennessPrep(tracking, plays, playerPlay)
      RadiusStage(cleaned)
        .select("gameId", "playId", "frameId", "nflId", "secondId", "open_count")
        .orderBy("gameId", "playId", "frameId", "nflId")
    },

    // Stage 6: route trees + mirror matching (Matchup Information.R)
    qRowsOnly("bdb_mirror_matchups") { (s, _) =>
      val (_, plays, _, playerPlay, tracking) = BdbMini.load(s)
      val trees = MatchupAnalysis.routeTrees(tracking, playerPlay, plays)
      MatchupAnalysis.mirrorMatches(trees)
        .orderBy("gameId", "playId")
    },

    // Entry point B, stages 1-4: defender stats → position pivot → play
    // feature matrix (DefCoverage.ipynb:34-120)
    qRowsOnly("bdb_coverage_features") { (s, _) =>
      val (_, plays, players, playerPlay, tracking) = BdbMini.load(s)
      CoveragePlayModel.features(plays, players, playerPlay, tracking,
          positions = Seq("CB", "S"))
        .orderBy("gameId", "playId")
    },

    // Entry point B, stage 5: coverage RandomForest metrics
    // (DefCoverage.ipynb:124-187, 221-237). repartition(4) — NOT
    // coalesce, which would throttle the whole upstream feature-build
    // stage to 4 tasks — inserts a barrier so only the many small
    // tree-training jobs run on 4 instead of 32 near-empty partitions
    // (the matrix is 10 rows; a fixture-sized decision made here, not
    // in the engine API).
    qRowsOnly("bdb_coverage_model") { (s, _) =>
      val (_, plays, players, playerPlay, tracking) = BdbMini.load(s)
      CoveragePlayModel.rfMetrics(
          CoveragePlayModel.features(plays, players, playerPlay, tracking,
            positions = Seq("CB", "S")).repartition(4))
        .orderBy("metric")
    },

    // cover_threshold.R:8-39 — disguise detection over the coverage
    // model's per-play probabilities: canon names, probability-of-actual
    // lookup, dig flag at the 0.8 threshold, per-play disguised column.
    // (repartition(4): same fixture-sized tree-training barrier as
    // bdb_coverage_model.)
    qRowsOnly("bdb_disguise") { (s, _) =>
      val (_, plays, players, playerPlay, tracking) = BdbMini.load(s)
      DisguiseDetection(CoveragePlayModel.predictions(
          CoveragePlayModel.features(plays, players, playerPlay, tracking,
            positions = Seq("CB", "S")).repartition(4)))
        .orderBy("gameId", "playId", "defensiveTeam")
    },
  )
}

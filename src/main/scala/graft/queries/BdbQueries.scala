package graft.queries

import graft.QueryDef
import graft.QueryDef.{q, qRowsOnly}
import graft.bdb._

/** SURVEY.md §3.1 entry point A as registered queries: the full
  * prep → openness → read-order → PRESS pipeline and the matchup
  * analysis, running on the deterministic BdbMini fixture (the sfDir
  * tables carry no tracking data; the pipeline is the reference's
  * domain product and is exercised end to end here + golden-tested in
  * PipelineSpec).
  *
  * The two purely-relational stages (`bdb_mirror_matchups`,
  * `bdb_coverage_features`) are DuckDB-oracled over the parquet fixture
  * replica (BdbMini.writeFixture); the kernel/ML stages stay rows-only
  * (MC openness / RF training are not SQL-expressible) with committed
  * goldens.
  */
object BdbQueries {

  /** DuckDB-side view of the parquet fixture replica (BdbMini
    * .writeFixture). Derived from the SAME path constant the writer
    * uses, so the two can never drift. */
  private def fixSql(table: String): String =
    s"read_parquet('${BdbMini.fixturePath}/$table/*.parquet')"

  /** The two purely-relational pipeline stages are DuckDB-oracled over
    * the parquet fixture (round-8 ask #1); the kernel/ML stages stay
    * rows-only with committed goldens. */
  private val mirrorOracle: String =
    s"""WITH pp AS (SELECT * FROM ${fixSql("player_play")}),
       |tr AS (SELECT * FROM ${fixSql("tracking")}),
       |pl AS (SELECT * FROM ${fixSql("plays")}),
       |trees AS (
       |  SELECT r.gameId, r.playId,
       |         string_agg(r.routeRan, ' ' ORDER BY t.y, r.nflId) AS route_tree
       |  FROM pp r
       |  JOIN tr t ON r.gameId = t.gameId AND r.playId = t.playId
       |           AND r.nflId = t.nflId
       |  WHERE r.wasRunningRoute AND t.frameType = 'SNAP'
       |  GROUP BY r.gameId, r.playId),
       |tc AS (
       |  SELECT trees.gameId, trees.playId, trees.route_tree,
       |         pl.pff_passCoverage
       |  FROM trees JOIN pl ON trees.gameId = pl.gameId
       |                    AND trees.playId = pl.playId),
       |wr AS (
       |  SELECT *, array_to_string(list_reverse(string_split(route_tree, ' ')), ' ')
       |           AS reversed_route
       |  FROM tc)
       |SELECT a.gameId, a.playId, a.route_tree,
       |       b.gameId AS mirror_gameId, b.playId AS mirror_playId
       |FROM wr a LEFT JOIN wr b
       |  ON a.pff_passCoverage = b.pff_passCoverage
       | AND a.route_tree = b.reversed_route
       | AND (a.gameId <> b.gameId OR a.playId <> b.playId)
       |ORDER BY a.gameId, a.playId""".stripMargin

  /** DefCoverage.ipynb:101-119 as one DuckDB CTE chain: the exact
    * decimal-summed moment arithmetic of CoveragePlayModel.positionStats
    * (sum/sum-of-squares in DECIMAL(16,6)/(,12), then double scalar math
    * — identical IEEE ops on both engines), the pinned CB/S pivot with
    * fill-0, and the play-context join + score_diff. */
  private val coverageFeaturesOracle: String = {
    val stats = Seq("x", "y", "s", "a")
    val moments = stats.map { c =>
      s"""         CAST(sum(CAST($c AS DECIMAL(16,6))) AS DOUBLE) AS ${c}_s1,
         |         CAST(sum(CAST($c AS DECIMAL(16,6)) * CAST($c AS DECIMAL(16,6))) AS DOUBLE) AS ${c}_s2,
         |         CAST(count($c) AS DOUBLE) AS ${c}_n""".stripMargin
    }.mkString(",\n")
    val meansStds = stats.map { c =>
      s"""         ${c}_s1 / ${c}_n AS ${c}_mean,
         |         CASE WHEN ${c}_n > 1
         |              THEN sqrt(greatest((${c}_s2 - ${c}_s1 * ${c}_s1 / ${c}_n) / (${c}_n - 1), 0.0))
         |         END AS ${c}_std""".stripMargin
    }.mkString(",\n")
    val pivotCols = Seq("CB", "S").flatMap { p =>
      stats.flatMap { c =>
        Seq(s"    COALESCE(max(CASE WHEN position = '$p' THEN ${c}_mean END), 0.0) AS ${c}_mean_$p",
            s"    COALESCE(max(CASE WHEN position = '$p' THEN ${c}_std END), 0.0) AS ${c}_std_$p")
      } :+
      s"    COALESCE(max(CASE WHEN position = '$p' THEN count_defenders END), 0) AS count_defenders_$p"
    }.mkString(",\n")
    s"""WITH pp AS (SELECT * FROM ${fixSql("player_play")}),
       |pl AS (SELECT * FROM ${fixSql("plays")}),
       |ply AS (SELECT * FROM ${fixSql("players")}),
       |tr AS (SELECT * FROM ${fixSql("tracking")}),
       |dt AS (
       |  SELECT d.gameId, d.playId, d.nflId, d.defensiveTeam, d.position,
       |         t.x, t.y, t.s, t.a
       |  FROM (
       |    SELECT pp.gameId, pp.playId, pp.nflId, pl.defensiveTeam, ply.position
       |    FROM pp
       |    JOIN pl ON pp.gameId = pl.gameId AND pp.playId = pl.playId
       |    LEFT JOIN ply ON pp.nflId = ply.nflId
       |    WHERE pl.isDropback AND ply.position IN ('CB', 'S')) d
       |  JOIN tr t ON d.gameId = t.gameId AND d.playId = t.playId
       |           AND d.nflId = t.nflId),
       |g AS (
       |  SELECT gameId, playId, defensiveTeam, position,
       |$moments,
       |         count(DISTINCT nflId) AS count_defenders
       |  FROM dt GROUP BY gameId, playId, defensiveTeam, position),
       |st AS (
       |  SELECT gameId, playId, defensiveTeam, position,
       |$meansStds,
       |         count_defenders
       |  FROM g),
       |pv AS (
       |  SELECT gameId, playId, defensiveTeam,
       |$pivotCols
       |  FROM st GROUP BY gameId, playId, defensiveTeam),
       |sub AS (
       |  SELECT DISTINCT gameId, playId, defensiveTeam, pff_passCoverage,
       |         down, yardsToGo, preSnapHomeScore, preSnapVisitorScore,
       |         absoluteYardlineNumber
       |  FROM pl)
       |SELECT pv.*, sub.pff_passCoverage,
       |       COALESCE(sub.down, 0) AS down,
       |       COALESCE(sub.yardsToGo, 0) AS yardsToGo,
       |       COALESCE(sub.preSnapHomeScore, 0) AS preSnapHomeScore,
       |       COALESCE(sub.preSnapVisitorScore, 0) AS preSnapVisitorScore,
       |       COALESCE(sub.absoluteYardlineNumber, 0) AS absoluteYardlineNumber,
       |       COALESCE(sub.preSnapHomeScore, 0) - COALESCE(sub.preSnapVisitorScore, 0)
       |         AS score_diff
       |FROM pv JOIN sub ON pv.gameId = sub.gameId AND pv.playId = sub.playId
       |                AND pv.defensiveTeam = sub.defensiveTeam
       |WHERE sub.pff_passCoverage IS NOT NULL
       |ORDER BY pv.gameId, pv.playId""".stripMargin
  }

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

    // Stage 6: route trees + mirror matching (Matchup Information.R:
    // 75-84) — J7/A9 over the fixture, DuckDB-oracled (round 8): the
    // Spark side reads the parquet replica BdbMini.writeFixture lays
    // down, and the oracle replays route-tree build + reverse-match
    // over the very same files.
    q("bdb_mirror_matchups", mirrorOracle) { (s, _) =>
      val fix = BdbMini.writeFixture(s)
      val plays = s.read.parquet(s"$fix/plays")
      val playerPlay = s.read.parquet(s"$fix/player_play")
      val tracking = s.read.parquet(s"$fix/tracking")
      val trees = MatchupAnalysis.routeTrees(tracking, playerPlay, plays)
      MatchupAnalysis.mirrorMatches(trees)
        .orderBy("gameId", "playId")
    },

    // Entry point B, stages 1-4: defender stats → position pivot → play
    // feature matrix (DefCoverage.ipynb:34-120) — DuckDB-oracled
    // (round 8): the moment sums are exact DECIMAL on both engines and
    // the scalar mean/std math is identical IEEE double ops, so the
    // whole 28-column matrix hash-matches.
    q("bdb_coverage_features", coverageFeaturesOracle) { (s, _) =>
      val fix = BdbMini.writeFixture(s)
      val plays = s.read.parquet(s"$fix/plays")
      val players = s.read.parquet(s"$fix/players")
      val playerPlay = s.read.parquet(s"$fix/player_play")
      val tracking = s.read.parquet(s"$fix/tracking")
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

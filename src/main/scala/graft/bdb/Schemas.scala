package graft.bdb

/** SURVEY.md §1 — the reference's five-table NFL data model as typed rows
  * (FIXTURES.md §2 columns; only those the reference touches).
  * Explicit types, named access only — no positional column access
  * (SURVEY.md §1.3 discipline).
  */
object Schemas {

  final case class Game(gameId: Long, homeTeamAbbr: String, visitorTeamAbbr: String)

  final case class Play(
      gameId: Long, playId: Int,
      possessionTeam: String, defensiveTeam: String,
      isDropback: Boolean, dropbackType: String,
      dropbackDistance: Double, unblockedPressure: Boolean,
      timeToThrow: Double, absoluteYardlineNumber: Int,
      pff_passCoverage: String,
      down: Int, yardsToGo: Int,
      preSnapHomeScore: Int, preSnapVisitorScore: Int,
      gameClock: String)

  final case class Player(nflId: Long, displayName: String, position: String)

  final case class PlayerPlay(
      gameId: Long, playId: Int, nflId: Long,
      teamAbbr: String,
      wasRunningRoute: Boolean, routeRan: Option[String],
      wasTargettedReceiver: Boolean,
      motionSinceLineset: Option[Boolean],
      pff_primaryDefensiveCoverageMatchupNflId: Option[Long],
      pff_defensiveCoverageAssignment: Option[String])

  final case class Tracking(
      gameId: Long, playId: Int, nflId: Option[Long],
      displayName: String, frameId: Int, frameType: String,
      time: String, jerseyNumber: Option[Int], club: String,
      playDirection: String,
      x: Double, y: Double, s: Double, a: Double, dis: Double,
      o: Double, dir: Double, event: Option[String])
}

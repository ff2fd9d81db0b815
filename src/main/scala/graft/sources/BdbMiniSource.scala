package graft.sources

import graft.bdb.{BdbMini, Schemas}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering, Statistics}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Encoder, Encoders}

import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 provider for the BdbMini data model —
  * `spark.read.format("graft-bdb").option("table", "tracking")` — the
  * source-side extension tier (TableProvider → Table → ScanBuilder →
  * Batch → PartitionReader) complementing the engine's Expression /
  * Rule / Strategy tiers.
  *
  * Scale semantics demonstrated for real:
  *  - one InputPartition per game — the natural split key of tracking
  *    data (a real deployment has thousands of games ⇒ thousands of
  *    splits);
  *  - `SupportsPushDownFilters`: an `EqualTo(gameId, _)` conjunct is
  *    consumed by the source and PRUNES entire partitions before any
  *    row is generated — the DSv2 analog of partition pruning;
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only
  *    the pruned schema, so `select(x, y)` never pays for the other
  *    columns (asserted in BdbMiniSourceSpec);
  *  - `SupportsPushDownAggregates` (round 7): a group-free COUNT(*)
  *    is answered by the SOURCE — each split emits ONE partial-count
  *    row instead of its rows, and Spark's final aggregate sums the
  *    per-split partials (`supportCompletePushDown` = false, the
  *    partial-pushdown contract). Composes with the gameId filter:
  *    filters push before aggregates, so a pruned scan counts only
  *    surviving splits. The DSv2 analog of metadata-only count(*).
  *    Round 8 extends this to GROUPED aggregates whose group key is
  *    the partition key: `GROUP BY gameId` with MIN/MAX/COUNT partials
  *    is answered per split (one row per split = one per group — the
  *    split key IS the group), so the full row stream never leaves the
  *    reader; grouping on anything else declines to the ordinary scan.
  *  - `SupportsPushDownLimit` / `SupportsPushDownTopN` (round 7): a
  *    bare LIMIT — or a single-column ORDER BY + LIMIT — is applied
  *    INSIDE each split's reader (`isPartiallyPushed` = true: each
  *    split emits at most N rows, Spark applies the final global
  *    limit/sort over ≤ N·splits survivors instead of every row).
  *    The TopN accept rule is conservative: one atomic-orderable sort
  *    column, else decline and let Spark run the ordinary sort — the
  *    same mergeable-top-k argument as `operators.GroupTopN`. On a
  *    provably SINGLE-split scan (players, or a gameId-pruned game
  *    table) both upgrade to COMPLETE pushdown (`isPartiallyPushed` =
  *    false): the one split's cut is the global answer, so Spark drops
  *    its own Sort/Limit.
  *  - `SupportsPushDownOffset` (round 10): OFFSET — and the W8
  *    ORDER BY + LIMIT + OFFSET pagination shape — pushes ONLY on a
  *    single-split scan, because the V2 offset contract is
  *    all-or-nothing (Spark deletes its Offset operator on accept; a
  *    per-split skip on a multi-split scan would drop offset·splits
  *    rows). Multi-split scans decline and Spark keeps the Offset over
  *    the still-TopN-pushed scan; the unsorted accept additionally
  *    leans on this reader's deterministic row order (documented at
  *    `pushOffset`).
  *  - `SupportsReportStatistics` (round 7): the scan reports exact
  *    row counts / sizes, so the STATIC planner already knows the
  *    games dimension is broadcast-sized — without stats every V2
  *    table looks huge, the static plan is a sort-merge join, and
  *    runtime DPP has no broadcast to reuse (it falls back to a
  *    no-op filter; observed before this was added).
  *  - `SupportsReportPartitioning` + `HasPartitionKey` (round 7):
  *    the scan reports `KeyGroupedPartitioning(identity(gameId))` and
  *    every split carries its gameId as the partition key, so with
  *    `spark.sql.sources.v2.bucketing.enabled` two graft-bdb tables
  *    JOIN ON gameId with NO Exchange on either side — the V2
  *    storage-partitioned join, the source-native analog of the s10
  *    bucketed join (spec-asserted shuffle-free plan; the conf is ON
  *    by default in Spark 4). Interplay with runtime filtering: under
  *    v2 bucketing Spark preserves the reported key set
  *    (pushPartValues), so runtime-pruned gameIds become EMPTY
  *    partitions; with bucketing off the splits disappear outright —
  *    BdbMiniSpjSpec asserts both behaviors.
  *  - `SupportsRuntimeFiltering` (round 7): the dynamic-partition-
  *    pruning analog for V2 — when the fact scan joins a SELECTIVE
  *    dimension on gameId, Spark re-plans the scan at runtime with the
  *    dim side's surviving keys (`RuntimeFilters: [dynamicpruning...]`
  *    in the plan) and `filter(In(gameId, ...))` drops whole splits
  *    before a single row is generated. At 100 TB this is the
  *    fact-table scan skipping every game a filtered dim join can
  *    never match.
  *
  * Each reader generates its split's rows on the EXECUTOR (the fixture
  * generator is a pure function), so nothing flows through the driver.
  */
class BdbMiniSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-bdb"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BdbMiniSource.schemaOf(BdbMiniSource.tableName(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BdbMiniTable(BdbMiniSource.tableName(
      new CaseInsensitiveStringMap(properties)))
}

object BdbMiniSource {
  val tables = Seq("games", "plays", "players", "player_play", "tracking")

  def tableName(options: CaseInsensitiveStringMap): String = {
    val t = options.getOrDefault("table", "")
    require(tables.contains(t), s"option 'table' must be one of $tables, got '$t'")
    t
  }

  def schemaOf(table: String): StructType = (table match {
    case "games" => Encoders.product[Schemas.Game]
    case "plays" => Encoders.product[Schemas.Play]
    case "players" => Encoders.product[Schemas.Player]
    case "player_play" => Encoders.product[Schemas.PlayerPlay]
    case "tracking" => Encoders.product[Schemas.Tracking]
  }).schema

  /** Rows of one split (gameId = None ⇒ the table has no game key and
    * lives in a single split). Runs on the executor. */
  def rowsOf(table: String, gameId: Option[Long]): Iterator[InternalRow] = {
    def ser[T: Encoder](rows: Seq[T]): Iterator[InternalRow] = {
      val s = ExpressionEncoder(implicitly[Encoder[T]]
          .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[T]])
        .createSerializer()
      rows.iterator.map(r => s(r).copy())
    }
    table match {
      case "games" =>
        ser(BdbMini.games.filter(g => gameId.forall(_ == g.gameId)))(Encoders.product[Schemas.Game])
      case "plays" =>
        ser(BdbMini.plays.filter(p => gameId.forall(_ == p.gameId)))(Encoders.product[Schemas.Play])
      case "players" =>
        ser(BdbMini.players)(Encoders.product[Schemas.Player])
      case "player_play" =>
        ser(BdbMini.playerPlay.filter(p => gameId.forall(_ == p.gameId)))(Encoders.product[Schemas.PlayerPlay])
      case "tracking" =>
        ser(BdbMini.tracking.filter(t => gameId.forall(_ == t.gameId)))(Encoders.product[Schemas.Tracking])
    }
  }
}

class BdbMiniTable(tableName: String) extends Table with SupportsRead {
  override def name(): String = s"graft-bdb.$tableName"
  override def schema(): StructType = BdbMiniSource.schemaOf(tableName)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BdbMiniScanBuilder(tableName)
}

/** One pushed per-group aggregate: kind ∈ count_star | count | min | max
  * (serializable — travels inside the reader factory to executors). */
case class BdbPushedAgg(kind: String, column: String)

class BdbMiniScanBuilder(tableName: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset {

  private var requiredSchema: StructType = BdbMiniSource.schemaOf(tableName)
  private var gameFilter: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var groupedAggs: Option[Seq[BdbPushedAgg]] = None
  private var limitPushed: Option[Int] = None
  private var topNPushed: Option[(String, Boolean, Boolean, Int)] = None
  private var offsetPushed: Option[Int] = None

  /** True iff this scan is provably ONE split at build time: the
    * unpartitioned players table, or a game table with the EqualTo
    * (gameId) filter already consumed (filters push before limits in
    * V2ScanRelationPushDown, so gameFilter is final here). Single-split
    * is what upgrades the limit/TopN pushdowns from partial to COMPLETE
    * and is the only shape that may accept OFFSET at all. */
  private def singleSplit: Boolean =
    tableName == "players" || gameFilter.isDefined

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!countPushed && groupedAggs.isEmpty) this.requiredSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("gameId", v: Long) => gameFilter = Some(v); true
      case EqualTo("gameId", v: Int) => gameFilter = Some(v.toLong); true
      case _ => false
    }
    pushed = accepted
    rejected // Spark re-applies these after the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  // Partial-pushdown contract: the scan emits partial rows per split
  // (one COUNT partial, or one row per split's group) and Spark's final
  // aggregate merges them (sum of counts, min of mins, max of maxes).
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  private def singleCol(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 &&
        BdbMiniSource.schemaOf(tableName).fieldNames.contains(f.fieldNames()(0)) =>
      Some(f.fieldNames()(0))
    case _ => None
  }

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    import org.apache.spark.sql.types._
    val full = BdbMiniSource.schemaOf(tableName)
    // tier 1: group-free COUNT(*) — one partial-count row per split
    if (aggregation.groupByExpressions.isEmpty &&
        aggregation.aggregateExpressions.length == 1 &&
        aggregation.aggregateExpressions()(0).isInstanceOf[CountStar]) {
      countPushed = true
      requiredSchema = StructType(Seq(
        StructField("count(*)", LongType, nullable = false)))
      return true
    }
    // tier 2 (round 8): per-gameId MIN/MAX/COUNT — the group column IS
    // the partition key, so each split holds exactly one group and can
    // answer its partials exactly: one row per split replaces the full
    // row stream. Anything beyond {gameId} grouping or min/max/count
    // declines — Spark then runs the ordinary scan + aggregate.
    if (tableName == "players") return false
    val groupCols = aggregation.groupByExpressions.toSeq.map(singleCol)
    if (groupCols != Seq(Some("gameId"))) return false
    // SUM pushes only for integral inputs: a per-split Long partial is
    // then EXACTLY the value Spark's final sum-of-sums expects, with no
    // float-accumulation-order question (a double SUM's partial split
    // could differ from the row-level plan by ulps — declined).
    def integral(c: String): Boolean = full(full.fieldIndex(c)).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val aggs = aggregation.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(BdbPushedAgg("count_star", ""))
      case c: Count if !c.isDistinct => singleCol(c.column).map(BdbPushedAgg("count", _))
      case m: Min => singleCol(m.column).map(BdbPushedAgg("min", _))
      case m: Max => singleCol(m.column).map(BdbPushedAgg("max", _))
      case s: Sum if !s.isDistinct =>
        singleCol(s.column).filter(integral).map(BdbPushedAgg("sum", _))
      case _ => None
    }
    if (aggs.exists(_.isEmpty)) return false
    val specs = aggs.flatten
    groupedAggs = Some(specs)
    requiredSchema = StructType(
      StructField("gameId", LongType, nullable = false) +: specs.map {
        case BdbPushedAgg("count_star", _) =>
          StructField("count(*)", LongType, nullable = false)
        case BdbPushedAgg("count", c) =>
          StructField(s"count($c)", LongType, nullable = false)
        case BdbPushedAgg("sum", c) =>
          // Catalyst's Sum(integral).dataType is LongType regardless of
          // the input width — the scan schema must match it
          StructField(s"sum($c)", LongType, nullable = true)
        case BdbPushedAgg(k, c) =>
          StructField(s"$k($c)", full(full.fieldIndex(c)).dataType, nullable = true)
      })
    true
  }

  // Pushdown contract for both limit and TopN: PARTIAL on a multi-split
  // scan (each split emits at most N rows; Spark applies the final global
  // limit / merge sort over the per-split survivors) and COMPLETE on a
  // single-split scan (the one split's cut IS the global answer, so Spark
  // deletes its own limit/sort — which is also what unlocks OFFSET: Spark
  // only attempts pushOffset after the limit was FULLY pushed).
  override def pushLimit(limit: Int): Boolean = {
    if (countPushed || groupedAggs.isDefined) false
    else { limitPushed = Some(limit); true }
  }

  override def isPartiallyPushed(): Boolean = !singleSplit

  /** OFFSET is all-or-nothing — Spark DELETES the Offset operator when
    * this returns true, there is no partial contract — and a per-split
    * offset on a multi-split scan would drop offset·splits rows. So the
    * DECLINE RULE is: accept only a provably single-split scan (players,
    * or a gameId-pruned game table) with no aggregate pushed; every other
    * shape returns false and Spark keeps its own Offset over the
    * (possibly still limit/TopN-pushed) scan. The unsorted case is
    * accepted under the same rule: a bare OFFSET without ORDER BY is
    * row-order-dependent on ANY source, and this reader's split order is
    * deterministic (the fixture generator), so skip-first-N is
    * well-defined — sources without a deterministic row order must also
    * decline here. */
  override def pushOffset(offset: Int): Boolean = {
    if (countPushed || groupedAggs.isDefined || !singleSplit) false
    else { offsetPushed = Some(offset); true }
  }

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (countPushed || groupedAggs.isDefined || orders.length != 1) return false
    val o = orders(0)
    o.expression() match {
      case f: NamedReference if f.fieldNames.length == 1 =>
        val name = f.fieldNames()(0)
        val full = BdbMiniSource.schemaOf(tableName)
        val orderable = full.fieldNames.contains(name) && {
          import org.apache.spark.sql.types._
          full(full.fieldIndex(name)).dataType match {
            case _: NumericType | StringType | BooleanType | DateType |
                 TimestampType => true
            case _ => false
          }
        }
        if (!orderable) false
        else {
          // honor the requested null placement (Spark defaults: ASC ⇒
          // NULLS FIRST, DESC ⇒ NULLS LAST, but a query may override) —
          // the per-split comparator places nulls explicitly instead of
          // NPEing on Comparable.compareTo(null)
          topNPushed = Some((name,
            o.direction() == SortDirection.DESCENDING,
            o.nullOrdering() == NullOrdering.NULLS_FIRST, limit))
          true
        }
      case _ => false
    }
  }

  override def build(): Scan =
    new BdbMiniScan(tableName, requiredSchema, gameFilter, countPushed,
      limitPushed, topNPushed, groupedAggs, offsetPushed)
}

case class BdbMiniSplit(table: String, gameId: Option[Long])
  extends InputPartition with HasPartitionKey {
  // storage-partitioned-join contract: the key row matches the
  // KeyGroupedPartitioning expressions (identity(gameId))
  override def partitionKey(): InternalRow = InternalRow(gameId.getOrElse(0L))
}

class BdbMiniScan(tableName: String, requiredSchema: StructType,
                  gameFilter: Option[Long],
                  countPushed: Boolean = false,
                  limitPushed: Option[Int] = None,
                  topNPushed: Option[(String, Boolean, Boolean, Int)] = None,
                  groupedAggs: Option[Seq[BdbPushedAgg]] = None,
                  offsetPushed: Option[Int] = None)
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportStatistics with SupportsReportPartitioning {

  override def outputPartitioning(): Partitioning =
    if (tableName == "players") new UnknownPartitioning(1)
    else new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("gameId")),
      planInputPartitions().length)

  override def estimateStatistics(): Statistics = new Statistics {
    // exact stats from the fixture generator: count the surviving
    // splits' rows (static gameId pushdown already applied). ~100
    // bytes/row is the serialized row ballpark; what matters for
    // planning is that 2-row games reports tiny and tracking large.
    private lazy val n: Long =
      if (tableName == "players") BdbMiniSource.rowsOf(tableName, None).size.toLong
      else BdbMini.games.map(_.gameId)
        .filter(g => gameFilter.forall(_ == g))
        .map(g => BdbMiniSource.rowsOf(tableName, Some(g)).size.toLong).sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 100)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  // runtime (DPP-style) split pruning: Spark hands the dim join's
  // surviving gameIds here after planning, before partitions are asked
  private var runtimeGameIds: Option[Set[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    if (tableName == "players") Array.empty
    else Array(org.apache.spark.sql.connector.expressions.Expressions.column("gameId"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("gameId", vs) =>
      runtimeGameIds = Some(vs.map {
        case l: Long => l
        case i: Int  => i.toLong
        case other   => other.toString.toLong
      }.toSet)
    case EqualTo("gameId", v: Long) => runtimeGameIds = Some(Set(v))
    case EqualTo("gameId", v: Int)  => runtimeGameIds = Some(Set(v.toLong))
    case _ => ()
  }

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-bdb table=$tableName pushedGame=$gameFilter" +
      (if (countPushed) " PushedAggregates=[COUNT(*)]" else "") +
      groupedAggs.map(as => " PushedAggregates=[" + as.map {
        case BdbPushedAgg("count_star", _) => "COUNT(*)"
        case BdbPushedAgg(k, c) => s"${k.toUpperCase}($c)"
      }.mkString(", ") + "] GroupedBy=[gameId]").getOrElse("") +
      limitPushed.map(n => s" PushedLimit=$n").getOrElse("") +
      topNPushed.map { case (c, d, nf, n) =>
        s" PushedTopN=[$c ${if (d) "DESC" else "ASC"} " +
          s"NULLS ${if (nf) "FIRST" else "LAST"} LIMIT $n]"
      }.getOrElse("") +
      offsetPushed.map(o => s" PushedOffset=$o").getOrElse("")

  /** One split per surviving game — EqualTo(gameId) pushdown prunes
    * splits HERE, before any row exists. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (tableName == "players") Array(BdbMiniSplit(tableName, None))
    else BdbMini.games.map(_.gameId)
      .filter(g => gameFilter.forall(_ == g))
      .filter(g => runtimeGameIds.forall(_.contains(g)))
      .map(g => BdbMiniSplit(tableName, Some(g)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BdbMiniReaderFactory(tableName, requiredSchema, countPushed,
      limitPushed, topNPushed, groupedAggs, offsetPushed)
}

class BdbMiniReaderFactory(tableName: String, requiredSchema: StructType,
                           countPushed: Boolean = false,
                           limitPushed: Option[Int] = None,
                           topNPushed: Option[(String, Boolean, Boolean, Int)] = None,
                           groupedAggs: Option[Seq[BdbPushedAgg]] = None,
                           offsetPushed: Option[Int] = None)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[BdbMiniSplit]
    new PartitionReader[InternalRow] {
      private val it: Iterator[InternalRow] =
        if (countPushed)
          // one partial-count row per split; rows never materialize
          Iterator.single(InternalRow(
            BdbMiniSource.rowsOf(tableName, split.gameId).size.toLong))
        else if (groupedAggs.isDefined) {
          // one row per split = one row per GROUP (gameId is the split
          // key, so each split answers its group's partials exactly);
          // full rows never leave the reader
          val full = BdbMiniSource.schemaOf(tableName)
          val rows = BdbMiniSource.rowsOf(tableName, split.gameId).toArray
          val vals: Seq[Any] = groupedAggs.get.map {
            case BdbPushedAgg("count_star", _) => rows.length.toLong
            case BdbPushedAgg("count", c) =>
              val i = full.fieldIndex(c)
              rows.count(r => !r.isNullAt(i)).toLong
            case BdbPushedAgg("sum", c) =>
              // exact Long partial (only integral columns are accepted);
              // Sum-of-empty is null, matching Catalyst's Sum partial
              val i = full.fieldIndex(c)
              val dt = full(i).dataType
              val nonNull = rows.iterator.filterNot(_.isNullAt(i)).map { r =>
                dt match {
                  case ByteType    => r.getByte(i).toLong
                  case ShortType   => r.getShort(i).toLong
                  case IntegerType => r.getInt(i).toLong
                  case _           => r.getLong(i)
                }
              }.toSeq
              if (nonNull.isEmpty) null else nonNull.sum
            case BdbPushedAgg(kind, c) =>
              val i = full.fieldIndex(c)
              val dt = full(i).dataType
              val nonNull = rows.iterator
                .filterNot(_.isNullAt(i)).map(_.get(i, dt)).toSeq
              if (nonNull.isEmpty) null
              else {
                val ord = Ordering.fromLessThan[Any]((a, b) =>
                  a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
                if (kind == "min") nonNull.min(ord) else nonNull.max(ord)
              }
          }
          Iterator.single(InternalRow.fromSeq(
            split.gameId.getOrElse(0L) +: vals))
        } else {
          val full = BdbMiniSource.schemaOf(tableName)
          val indices = requiredSchema.fieldNames.map(full.fieldIndex)
          val base = BdbMiniSource.rowsOf(tableName, split.gameId)
          // per-split TopN / limit BEFORE projection (the sort column
          // may be outside the pruned schema). Fixture splits are
          // small, so a full sort is fine; a real source would keep a
          // size-N bounded heap (GroupTopK.localTopK's shape).
          val cut: Iterator[InternalRow] = topNPushed match {
            case Some((cname, desc, nullsFirst, n)) =>
              val idx = full.fieldIndex(cname)
              val dt = full(idx).dataType
              // null-aware total order matching the pushed SortOrder:
              // direction on non-nulls, explicit null placement (a
              // Comparable.compareTo(null) NPE otherwise)
              val ord = new Ordering[InternalRow] {
                def compare(a: InternalRow, b: InternalRow): Int = {
                  val av = a.get(idx, dt)
                  val bv = b.get(idx, dt)
                  if (av == null && bv == null) 0
                  else if (av == null) { if (nullsFirst) -1 else 1 }
                  else if (bv == null) { if (nullsFirst) 1 else -1 }
                  else {
                    val c = av.asInstanceOf[Comparable[Any]].compareTo(bv)
                    if (desc) -c else c
                  }
                }
              }
              base.toArray.sorted(ord).iterator.take(n)
            case None =>
              limitPushed.map(base.take).getOrElse(base)
          }
          // pushed OFFSET applies after the (limit-inclusive) cut: Spark
          // pushed TopN/limit as (n + offset) and offset separately, so
          // the window is rows [offset, n + offset) of the sorted/raw
          // stream — only reachable on single-split scans (see
          // pushOffset's decline rule)
          val window = offsetPushed.map(cut.drop).getOrElse(cut)
          window.map { r =>
            // project to the pruned schema only
            InternalRow.fromSeq(indices.map(i => r.get(i, full(i).dataType)).toSeq)
          }
        }
      private var current: InternalRow = _
      override def next(): Boolean = { val has = it.hasNext; if (has) current = it.next(); has }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

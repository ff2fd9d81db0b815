package graft.sources

import graft.bdb.{BdbMini, Schemas}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering, Statistics}
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types.StructType
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
  *  - `SupportsPushDownLimit` / `SupportsPushDownTopN` (round 7): a
  *    bare LIMIT — or a single-column ORDER BY + LIMIT — is applied
  *    INSIDE each split's reader (`isPartiallyPushed` = true: each
  *    split emits at most N rows, Spark applies the final global
  *    limit/sort over ≤ N·splits survivors instead of every row).
  *    The TopN accept rule is conservative: one atomic-orderable sort
  *    column, else decline and let Spark run the ordinary sort — the
  *    same mergeable-top-k argument as `operators.GroupTopN`.
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

class BdbMiniScanBuilder(tableName: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var requiredSchema: StructType = BdbMiniSource.schemaOf(tableName)
  private var gameFilter: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var countPushed = false
  private var limitPushed: Option[Int] = None
  private var topNPushed: Option[(String, Boolean, Int)] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    if (!countPushed) this.requiredSchema = requiredSchema

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

  // Partial-pushdown contract: the scan emits one COUNT partial per
  // split and Spark's final aggregate sums them.
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    val ok = aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (ok) {
      countPushed = true
      requiredSchema = StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
    }
    ok
  }

  // Partial-pushdown contract for both: each split emits at most N
  // rows; Spark still applies the global limit (and for TopN the final
  // merge sort) over the per-split survivors.
  override def pushLimit(limit: Int): Boolean = {
    if (countPushed) false
    else { limitPushed = Some(limit); true }
  }

  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (countPushed || orders.length != 1) return false
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
          topNPushed =
            Some((name, o.direction() == SortDirection.DESCENDING, limit))
          true
        }
      case _ => false
    }
  }

  override def build(): Scan =
    new BdbMiniScan(tableName, requiredSchema, gameFilter, countPushed,
      limitPushed, topNPushed)
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
                  topNPushed: Option[(String, Boolean, Int)] = None)
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
      limitPushed.map(n => s" PushedLimit=$n").getOrElse("") +
      topNPushed.map { case (c, d, n) =>
        s" PushedTopN=[$c ${if (d) "DESC" else "ASC"} LIMIT $n]"
      }.getOrElse("")

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
      limitPushed, topNPushed)
}

class BdbMiniReaderFactory(tableName: String, requiredSchema: StructType,
                           countPushed: Boolean = false,
                           limitPushed: Option[Int] = None,
                           topNPushed: Option[(String, Boolean, Int)] = None)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[BdbMiniSplit]
    new PartitionReader[InternalRow] {
      private val it: Iterator[InternalRow] =
        if (countPushed)
          // one partial-count row per split; rows never materialize
          Iterator.single(InternalRow(
            BdbMiniSource.rowsOf(tableName, split.gameId).size.toLong))
        else {
          val full = BdbMiniSource.schemaOf(tableName)
          val indices = requiredSchema.fieldNames.map(full.fieldIndex)
          val base = BdbMiniSource.rowsOf(tableName, split.gameId)
          // per-split TopN / limit BEFORE projection (the sort column
          // may be outside the pruned schema). Fixture splits are
          // small, so a full sort is fine; a real source would keep a
          // size-N bounded heap (GroupTopK.localTopK's shape).
          val cut: Iterator[InternalRow] = topNPushed match {
            case Some((cname, desc, n)) =>
              val idx = full.fieldIndex(cname)
              val dt = full(idx).dataType
              val ord = new Ordering[InternalRow] {
                def compare(a: InternalRow, b: InternalRow): Int =
                  a.get(idx, dt).asInstanceOf[Comparable[Any]]
                    .compareTo(b.get(idx, dt))
              }
              base.toArray
                .sorted(if (desc) ord.reverse else ord)
                .iterator.take(n)
            case None =>
              limitPushed.map(base.take).getOrElse(base)
          }
          cut.map { r =>
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

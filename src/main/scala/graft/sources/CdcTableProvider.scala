package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.{ChangeIndex, TrackedFieldMeta}

/** The custom CDC `MicroBatchStream` source (SURVEY §7.4): a DataSource V2
  * streaming source whose offset is the engine's own [[CdcOffset]] (change
  * index per table) and whose pacing is the reference's
  * `db_row_batch_size` — each micro-batch advances at most `batchSize`
  * rows in strict change-index order.
  *
  * Scale shape (round-2 redesign): the driver runs exactly ONE small job
  * per trigger — a boundary probe that returns a single aggregated row
  * (the batch's end key), never the window itself — and each
  * InputPartition carries only the PREDICATE (the offset range) plus a
  * file split; executors read the staged parquet directly. Round 1
  * computed every window twice (ordered scan in `latestOffset`, re-scan in
  * `planInputPartitions`) and shipped all rows driver→executor, which
  * caps throughput at driver memory — the reference has the same
  * single-process bottleneck by design (`tracked_tables.py` row queues),
  * and this source exists to remove it.
  *
  * TWO BACKENDS behind one offset/admission mechanism (round-6 addition):
  *
  *   - PARQUET (default): boundary probes are one-row Spark aggregations
  *     over the staged feed; partitions carry a file split + predicate.
  *   - JDBC (`jdbcUrl` set): boundary probes issue
  *     [[SqlServerDialect.changeBoundaryQuery]]/[[SqlServerDialect.snapshotBoundaryQuery]]
  *     over a driver-side connection (batchSize narrow KEY tuples cross
  *     the wire, the client keeps only the last); partitions carry the
  *     [[SqlServerDialect.changeWindowQuery]]/[[SqlServerDialect.snapshotWindowQuery]]
  *     text for the committed range, executed ON THE EXECUTOR — the
  *     same shape as the reference's polling queries
  *     (`cdc_kafka/sql_queries.py:218-309,312-367`), minus its
  *     single-process row queue. One partition per (table, window): CDC
  *     windows are batchSize-bounded by construction, so parallelism at
  *     scale comes from MANY TABLES (and the snapshot dimension), not
  *     from splitting a 2000-row window. The environment's endpoint is
  *     embedded Derby, so the generated T-SQL runs through the
  *     mechanical [[AnsiTranspile]]; a SQL Server deployment prepares
  *     the T-SQL with its native `?` binds instead.
  *
  * Usage:
  *   spark.readStream.format("graft.sources.CdcTableProvider")
  *     .option("feedDir", dir).option("tableName", t)
  *     .option("batchSize", "2000").load()
  *   // JDBC mode:
  *     .option("jdbcUrl", "jdbc:derby:memory:db")
  *     .option("captureInstance", "events")
  *     .option("snapshotTable", "dbo.events")  // optional, enables backfill
  */
class CdcTableProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcTable(properties.asScala.toMap)
}

object CdcTableProvider {
  /** Staged change-feed layout (matches CdcPipeline.stageChangeFeed). */
  val schema: StructType = StructType(Seq(
    StructField("lsn_num", LongType), StructField("command_id", IntegerType),
    StructField("seqval_num", LongType), StructField("operation", IntegerType),
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The snapshot dimension's composite keyset key (unique by contract). */
  val snapshotPk: Seq[TrackedFieldMeta] = Seq(
    TrackedFieldMeta("user_id", "bigint", 0, 0),
    TrackedFieldMeta("event_id", "bigint", 0, 0))

  /** Value columns a JDBC change window selects after the 4 index cols. */
  val changeValueFields: Seq[String] =
    Seq("event_id", "user_id", "event_type", "value", "props")

  /** Columns a JDBC snapshot window selects (keys first). */
  val snapshotFields: Seq[String] =
    Seq("user_id", "event_id", "event_type", "value", "props")
}

private class CdcTable(options: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = options.getOrElse("tablename", "cdc_feed")
  override def schema(): StructType = CdcTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // Read options surface here (case-insensitive), not in the table
    // properties map.
    val merged = options.map { case (k, v) => k.toLowerCase -> v } ++
      opts.asCaseSensitiveMap().asScala.map { case (k, v) => k.toLowerCase -> v }
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = CdcTableProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
          val batchSize = merged.getOrElse("batchsize", "2000").toInt
          val backend = merged.get("jdbcurl") match {
            case Some(url) =>
              new JdbcBackend(url,
                merged.getOrElse("captureinstance",
                  merged.getOrElse("tablename", "cdc_feed")),
                merged.get("snapshottable").map { st =>
                  st.split('.') match {
                    case Array(s, t) => (s, t)
                    case _ => ("dbo", st)
                  }
                },
                batchSize,
                merged.getOrElse("terminateoncaptureinstancechange", "false").toBoolean)
            case None =>
              new ParquetBackend(
                merged.getOrElse("feeddir", sys.error("feedDir option required")),
                merged.get("snapshotdir"),
                batchSize)
          }
          new CdcMicroBatchStream(
            merged.getOrElse("tablename", "cdc_feed"), batchSize, backend,
            LsnGap.parse(merged.getOrElse("lsngapstrategy", "fail")),
            StartPoint.parse(merged.getOrElse("startpoint", "earliest")))
        }
      }
    }
  }
}

/** Offset = the serialized CdcOffset for this one table. */
private case class CdcStreamOffset(offset: CdcOffset) extends Offset {
  override def json(): String = offset.json
}

/** Stored change progress fell below the feed's retention floor and the
  * configured strategy is fail (G5). */
final class CdcLsnGapException(msg: String) extends RuntimeException(msg)

/** G5 in-stream: CDC cleanup can outrun stored progress — the DB's
  * minimum retained change index moves past the checkpoint and rows in
  * between are gone (`tracked_tables.py:137-163`, `options.py:148-154`).
  * Checked before every change-window advance. Deliberately CONSERVATIVE,
  * like the reference's min-LSN comparison: a cleanup that deleted
  * exactly through the consumed position is indistinguishable from one
  * that deleted past it (the evidence is the deleted rows), so it flags. */
private object LsnGap {

  def parse(s: String): graft.model.Policies.LsnGapAction = s.toLowerCase match {
    case "fail" => graft.model.Policies.FailOnGap
    case "ignore" => graft.model.Policies.IgnoreGap
    case "resnapshot" => graft.model.Policies.ResnapshotOnGap
    case other =>
      sys.error(s"unknown lsnGapStrategy '$other' (fail | ignore | resnapshot)")
  }

  /** The outcome of the per-advance gap check. */
  sealed trait Outcome
  /** No gap (or strategy=ignore): advance changes normally. */
  case object Proceed extends Outcome
  /** Re-backfill: flip the snapshot dimension AND advance the change
    * cursor to `resumeFrom` (= predecessor(min retained)), so the
    * strictly-after scan resumes at the retention floor inclusively and
    * the gap check cannot re-fire after the backfill — without the
    * cursor advance this strategy loops forever (flip, backfill, flip). */
  final case class Resnapshot(resumeFrom: graft.model.ChangeIndex) extends Outcome

  /** Gap predicate: `stored < predecessor(minRetained)` — true exactly
    * when an index EXISTS strictly between the stored cursor and the
    * retention floor, i.e. a cleaned row could have been missed. (The
    * coarser `stored < min` is wrong twice over: it false-positives when
    * the floor is the immediate successor, and it makes resnapshot
    * re-fire after its own backfill.) IgnoreGap skips the probe entirely
    * — resume-from-min falls out of the strictly-after scan with no
    * extra job (the reference's begin_at_min_lsn). */
  def resolve(backend: FeedBackend, table: String,
      stored: graft.model.ChangeIndex,
      strategy: graft.model.Policies.LsnGapAction): Outcome = {
    import graft.model.{ChangeIndex, Policies}
    if (strategy == Policies.IgnoreGap || stored == ChangeIndex.Lowest)
      return Proceed
    val floorPred = backend.minAvailableChange()
      .filter(_ != ChangeIndex.Lowest).map(ChangeIndex.predecessor)
    floorPred.filter(p => stored < p) match {
      case None => Proceed
      case Some(p) => strategy match {
        case Policies.FailOnGap =>
          throw new CdcLsnGapException(
            s"table '$table': stored change progress ${stored.lsnHex} is below " +
              "the feed's minimum retained index — CDC cleanup outran the " +
              "stream and rows may be lost (lsnGapStrategy=fail)")
        case Policies.ResnapshotOnGap =>
          if (backend.hasSnapshot) Resnapshot(p)
          else throw new CdcLsnGapException(
            s"table '$table': LSN gap with lsnGapStrategy=resnapshot but no " +
              "snapshot source is configured — cannot re-backfill")
        case Policies.IgnoreGap => Proceed // unreachable (probe skipped)
      }
    }
  }
}

/** The data-access seam between the offset/admission mechanics (shared)
  * and the storage a deployment actually reads (staged parquet or a live
  * JDBC endpoint). Boundary probes run ON THE DRIVER once per trigger and
  * return a single key; partition methods return predicate-carrying
  * splits for the committed range — never rows. */
private trait FeedBackend {
  /** Max change index among the batchSize rows strictly after `start`,
    * WITH the window's row count (count == batchSize means the table has
    * a full window pending — the reference's "lagging" signal, E6);
    * None when the feed has nothing new. */
  def changeBoundary(start: ChangeIndex): Option[(ChangeIndex, Long)]
  /** Min composite key among the batchSize snapshot keys strictly below
    * `below` (unbounded when None); None when the page is empty (G3) or
    * the table has no snapshot dimension. */
  def snapshotPageBoundary(below: Option[(Long, Long)]): Option[(Long, Long)]
  /** True when this table backfills a snapshot before changes. */
  def hasSnapshot: Boolean
  /** MIN retained change index (G5 gap detection); None on an empty feed. */
  def minAvailableChange(): Option[ChangeIndex]
  /** MAX change index currently in the feed — the per-table ceiling
    * `startPoint=latest` starts strictly after (A5's table half,
    * `options.py:156-166`); None on an empty feed. */
  def maxAvailableChange(): Option[ChangeIndex]
  def changePartitions(start: (Long, Int, Long, Int),
      end: (Long, Int, Long, Int)): Array[InputPartition]
  def snapshotPartitions(upper: Option[(Long, Long)],
      lower: (Long, Long)): Array[InputPartition]
}

/** `--new-follow-start-point` (`options.py:156-166`) as a source option:
  * where a table with NO prior progress (no checkpoint entry) begins.
  * `earliest` pulls everything retained; `latest` starts strictly after
  * the feed's current max change index — nothing already present
  * republishes, anything committed later does. Documented respec vs the
  * reference: it sets only the LSN half of the start index from the
  * GLOBAL `sys.fn_cdc_get_max_lsn()` ceiling (so rows already at that
  * exact LSN could republish); this engine probes the per-table max
  * FULL index, which delivers the option's actual promise exactly.
  * Snapshots are unaffected, as the reference documents. */
private object StartPoint {
  def parse(s: String): String = s.toLowerCase match {
    case "earliest" | "latest" => s.toLowerCase
    case other =>
      sys.error(s"unknown startPoint '$other' (earliest | latest)")
  }
}

private class CdcMicroBatchStream(tableName: String, batchSize: Int,
    backend: FeedBackend,
    gapStrategy: graft.model.Policies.LsnGapAction = graft.model.Policies.FailOnGap,
    startPoint: String = "earliest")
    extends MicroBatchStream with SupportsAdmissionControl {

  // G5 runs ONCE per query instance, on the first change advance — the
  // reference's startup progress-vs-min-LSN validation
  // (`tracked_tables.py:137-163`), where a gap can actually appear (the
  // stream was down, cleanup ran). A per-trigger probe would double the
  // driver's per-trigger job count for a condition that cannot arise
  // while the query itself is consuming (CdcSourcePlanSpec pins the
  // one-probe-per-trigger budget).
  private val gapChecked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def pos(o: Offset): TablePosition =
    o.asInstanceOf[CdcStreamOffset].offset.tables
      .getOrElse(tableName, initialPosition)

  private def initialSnapshot: SnapshotPosition =
    if (backend.hasSnapshot) SnapshotNotStarted else SnapshotDone

  // `startPoint=latest` (see [[StartPoint]]): the fresh-follow floor is
  // the feed's current max index, probed once at query start (lazy val —
  // a checkpointed restart never calls initialOffset, so a resumed query
  // pays no probe and, more importantly, cannot MOVE its floor).
  private lazy val initialPosition: TablePosition =
    TablePosition(
      if (startPoint == "latest")
        backend.maxAvailableChange().getOrElse(ChangeIndex.Lowest)
      else ChangeIndex.Lowest,
      initialSnapshot)

  private def mkOffset(p: TablePosition): CdcStreamOffset =
    CdcStreamOffset(CdcOffset(Map(tableName -> p)))

  override def initialOffset(): Offset = mkOffset(initialPosition)

  // Snapshot pages walk a COMPOSITE key (user_id, event_id): paging on
  // user_id alone would drop rows whenever duplicate key values straddle
  // a page boundary (the strictly-below filter excludes the remainder of
  // the split group forever). The reference pages on the full PK for the
  // same reason (`sql_queries.py:312-367`). CONTRACT: the composite
  // (user_id, event_id) must be UNIQUE in the snapshot table — keyset
  // pagination over non-unique keys cannot be lossless. Codec + signed
  // ordering live in [[SnapshotKey]] (shared with the inspection tools).
  private def keyHex(k: Long, e: Long): String = SnapshotKey.toHex(k, e)
  private def keyFromHex(h: String): (Long, Long) = SnapshotKey.fromHex(h)

  override def deserializeOffset(json: String): Offset =
    CdcStreamOffset(CdcOffset.fromJson(json))

  /** Admission control: the snapshot dimension advances first — one
    * reverse-keyset page per trigger until the empty-page probe declares
    * SnapshotDone (G3) — then the change dimension advances at most
    * `batchSize` rows per trigger (the reference's TOP(batch_size)
    * pacing, E6/E7; interleaving policy `main.py:214-267`). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val p = pos(start)
    p.snapshot match {
      case SnapshotNotStarted | SnapshotAt(_) =>
        val below = p.snapshot match {
          case SnapshotAt(h) => Some(keyFromHex(h))
          case _ => None
        }
        backend.snapshotPageBoundary(below) match {
          case None => mkOffset(p.copy(snapshot = SnapshotDone))
          case Some((u, e)) => mkOffset(p.copy(snapshot = SnapshotAt(keyHex(u, e))))
        }
      case SnapshotDone =>
        val gap =
          if (gapChecked.getAndSet(true))
            LsnGap.Proceed
          else LsnGap.resolve(backend, tableName, p.changeIndex, gapStrategy)
        gap match {
          case LsnGap.Resnapshot(resumeFrom) =>
            mkOffset(p.copy(snapshot = SnapshotNotStarted,
              changeIndex = resumeFrom))
          case LsnGap.Proceed =>
            val end = backend.changeBoundary(p.changeIndex)
              .map(_._1).getOrElse(p.changeIndex)
            mkOffset(p.copy(changeIndex = end))
        }
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl.latestOffset(start, limit) is used")

  /** Partitions carry the offset-range PREDICATE (a file split or a range
    * query) — never rows. Replay after restart therefore depends only on
    * the committed offset pair: re-planning a batch with a different
    * configured batchSize yields exactly the same rows (no limit() in
    * this path). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = pos(start); val e = pos(end)
    (s.snapshot, e.snapshot) match {
      case (SnapshotDone, SnapshotNotStarted) =>
        Array.empty // G5 re-backfill flip: pages start NEXT trigger
      case (sp, ep) if sp != ep && ep != SnapshotDone =>
        // A snapshot page: keys strictly below the start bound, down to
        // and including the end position's composite key.
        val upper = sp match {
          case SnapshotAt(h) => Some(keyFromHex(h))
          case _ => None
        }
        val lower = ep match {
          case SnapshotAt(h) => keyFromHex(h)
          case _ => (Long.MinValue, Long.MinValue)
        }
        backend.snapshotPartitions(upper, lower)
      case (sp, SnapshotDone) if sp != SnapshotDone =>
        Array.empty // the done-transition batch carries no rows
      case _ =>
        if (s.changeIndex >= e.changeIndex) Array.empty
        else backend.changePartitions(
          ChangeIndex.parts(s.changeIndex), ChangeIndex.parts(e.changeIndex))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = CdcPredicateReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Staged-parquet backend: probes are one-row Spark aggregations; splits
  * are (file, predicate) pairs read executor-side with the parquet Group
  * API. */
private class ParquetBackend(feedDir: String, snapshotDir: Option[String],
    batchSize: Int) extends FeedBackend {

  private def spark = SparkSession.active

  override def hasSnapshot: Boolean = snapshotDir.isDefined

  private def belowPredicate(k: Long, e: Long) =
    col("user_id") < k || (col("user_id") === k && col("event_id") < e)

  /** Boundary probe for the next reverse-keyset snapshot page: the MIN
    * composite key among the `batchSize` keys strictly below the bound
    * (A2's query shape, reduced to its last row). One job, one row back
    * to the driver; None when the page is empty (snapshot drained, G3). */
  override def snapshotPageBoundary(below: Option[(Long, Long)]): Option[(Long, Long)] = {
    if (snapshotDir.isEmpty) return None
    val base = spark.read.schema(CdcTableProvider.schema)
      .parquet(snapshotDir.get)
    val bounded = below.map { case (k, e) => base.filter(belowPredicate(k, e)) }
      .getOrElse(base)
    val r = bounded.orderBy(col("user_id").desc, col("event_id").desc)
      .limit(batchSize)
      .agg(count(lit(1)).as("n"),
        min(struct(col("user_id"), col("event_id"))).as("lo"))
      .head()
    if (r.getLong(0) == 0L) None
    else Some((r.getStruct(1).getLong(0), r.getStruct(1).getLong(1)))
  }

  /** Boundary probe for the next change window: the MAX change index among
    * the `batchSize` rows strictly after `start` (A1's ordered TOP scan,
    * reduced to its last row). None when no new rows exist. */
  override def changeBoundary(start: ChangeIndex): Option[(ChangeIndex, Long)] = {
    val (sl, sc, ss, so) = ChangeIndex.parts(start)
    val r = spark.read.schema(CdcTableProvider.schema).parquet(feedDir)
      .filter(struct(col("lsn_num"), col("command_id"), col("seqval_num"), col("operation")) >
        struct(lit(sl).as("lsn_num"), lit(sc).as("command_id"),
          lit(ss).as("seqval_num"), lit(so).as("operation")))
      .orderBy(col("lsn_num"), col("command_id"), col("seqval_num"), col("operation"))
      .limit(batchSize)
      .agg(count(lit(1)).as("n"),
        max(struct(col("lsn_num"), col("command_id"),
          col("seqval_num"), col("operation"))).as("hi"))
      .head()
    if (r.getLong(0) == 0L) None
    else {
      val s = r.getStruct(1)
      Some((ChangeIndex(ChangeIndex.lsnFromLong(s.getLong(0)), s.getInt(1),
        ChangeIndex.lsnFromLong(s.getLong(2)), s.getInt(3)), r.getLong(0)))
    }
  }

  override def minAvailableChange(): Option[ChangeIndex] = {
    val r = spark.read.schema(CdcTableProvider.schema).parquet(feedDir)
      .agg(min(struct(col("lsn_num"), col("command_id"),
        col("seqval_num"), col("operation"))).as("lo"))
      .head()
    if (r.isNullAt(0)) None
    else {
      val s = r.getStruct(0)
      Some(ChangeIndex(ChangeIndex.lsnFromLong(s.getLong(0)), s.getInt(1),
        ChangeIndex.lsnFromLong(s.getLong(2)), s.getInt(3)))
    }
  }

  override def maxAvailableChange(): Option[ChangeIndex] = {
    val r = spark.read.schema(CdcTableProvider.schema).parquet(feedDir)
      .agg(max(struct(col("lsn_num"), col("command_id"),
        col("seqval_num"), col("operation"))).as("hi"))
      .head()
    if (r.isNullAt(0)) None
    else {
      val s = r.getStruct(0)
      Some(ChangeIndex(ChangeIndex.lsnFromLong(s.getLong(0)), s.getInt(1),
        ChangeIndex.lsnFromLong(s.getLong(2)), s.getInt(3)))
    }
  }

  private def listParquet(dir: String): Array[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(path).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  override def changePartitions(start: (Long, Int, Long, Int),
      end: (Long, Int, Long, Int)): Array[InputPartition] =
    listParquet(feedDir).map(f => ChangeRangePartition(f, start, end): InputPartition)

  override def snapshotPartitions(upper: Option[(Long, Long)],
      lower: (Long, Long)): Array[InputPartition] =
    listParquet(snapshotDir.get).map(f =>
      SnapshotRangePartition(f, upper, lower): InputPartition)
}

/** The capture-instance schema changed under a running query. A
  * Structured Streaming query cannot change schema mid-run, so the
  * source terminates for supervisor restart — the reference's own
  * answer (`main.py:358-409`); the message carries the G6
  * re-snapshot decision the supervisor acts on. */
final class CdcSchemaChangedException(msg: String) extends RuntimeException(msg)

/** Live-database backend: probes stream batchSize KEY tuples over a
  * driver-side connection and keep the last; splits carry the complete
  * range-query text, executed executor-side. The endpoint here speaks
  * ANSI (embedded Derby), so the dialect's T-SQL runs through
  * [[AnsiTranspile]] with literal-substituted binds; a SQL Server
  * deployment would carry (tsql, binds) and prepare natively.
  *
  * SCHEMA WATCH (G6 in-stream): the change table's live column set is
  * re-read on every change poll (one catalog read per cycle, portable
  * JDBC metadata) and compared against the source's FIXED projection
  * contract — the restart-stable baseline: a post-restart backend must
  * still detect drift that happened while the query was down, so the
  * expectation cannot be a query-start snapshot. Any drift (column
  * set, or serialized type of a projected column) terminates the query
  * with [[CdcSchemaChangedException]] carrying
  * [[graft.model.SchemaEvolution.requiresNewSnapshot]]'s verdict —
  * detect-and-terminate, never silently mis-project (a new column the
  * projection would silently drop counts as drift, exactly like the
  * reference's new-capture-instance handling). */
private class JdbcBackend(url: String, captureInstance: String,
    snapshotTable: Option[(String, String)], batchSize: Int,
    terminateOnCaptureInstanceChange: Boolean = false) extends FeedBackend {

  import AnsiTranspile.{hex20, lit, parseHex20}

  import graft.model.SchemaEvolution

  override def hasSnapshot: Boolean = snapshotTable.isDefined

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Value columns of the change table via portable JDBC metadata
    * (`__$` system columns excluded). Generic-ANSI type names normalize
    * to the dialect's (TrackedFieldMeta's) vocabulary so the G6
    * serialization-equivalence check applies unchanged. */
  private def ctColumns(): Map[String, SchemaEvolution.ColumnInfo] = withConn { c =>
    val rs = c.getMetaData.getColumns(null, "cdc", captureInstance + "_CT", null)
    val out = Map.newBuilder[String, SchemaEvolution.ColumnInfo]
    while (rs.next()) {
      val name = rs.getString("COLUMN_NAME")
      if (!name.startsWith("__$")) {
        val t = rs.getString("TYPE_NAME").toLowerCase match {
          case "integer" => "int"
          case "double" | "double precision" => "float"
          case "character" => "char"
          case "character varying" => "varchar"
          case "timestamp" => "datetime2"
          case other => other
        }
        out += name -> SchemaEvolution.ColumnInfo(t,
          rs.getInt("COLUMN_SIZE"), rs.getInt("DECIMAL_DIGITS"),
          isComputed = false,
          isNullable =
            rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
      }
    }
    rs.close()
    out.result()
  }

  /** The projection contract: value column → SQL type, derived from the
    * source's fixed output schema (what [[SqlServerDialect.changeWindowQuery]]
    * SELECTs). Restart-stable by construction. */
  private val expectedColumns: Map[String, SchemaEvolution.ColumnInfo] = {
    val sqlName: Map[org.apache.spark.sql.types.DataType, String] = Map(
      LongType -> "bigint", IntegerType -> "int",
      StringType -> "varchar", DoubleType -> "float")
    CdcTableProvider.schema.fields
      .filter(f => CdcTableProvider.changeValueFields.contains(f.name))
      .map(f => f.name -> SchemaEvolution.ColumnInfo(sqlName(f.dataType)))
      .toMap
  }

  private def sparkTypeOf(info: SchemaEvolution.ColumnInfo): Option[org.apache.spark.sql.types.DataType] =
    scala.util.Try(graft.model.TrackedFieldMeta("c", info.sqlTypeName, 0, 0,
      info.decimalPrecision, info.decimalScale).sparkType).toOption

  /** One non-null existence probe per candidate column — cheap on the
    * CDC table (the reference only probes when small/indexed; the probe
    * here feeds the REPORTED decision, the terminate is unconditional). */
  private def hasNonNull(colName: String): Boolean = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        s"""SELECT 1 FROM "cdc"."${captureInstance}_CT" """ +
          s"""WHERE "$colName" IS NOT NULL FETCH FIRST 1 ROWS ONLY""")
      val found = rs.next()
      rs.close()
      found
    } finally st.close()
  }

  // G6 runtime half, instance dimension: does the CDC catalog carry a
  // NEWER capture instance for our source table? Coexisting instances
  // are how capture topology migrates, so the column-drift watch alone
  // cannot see this (`main.py:358-409`). Consulted per boundary probe
  // (one tiny seek) only under `terminateOnCaptureInstanceChange`, and
  // only when the catalog table exists — probed ONCE: test fixtures and
  // minimal deployments without a mirrored `cdc.change_tables` simply
  // run without the watch.
  private lazy val catalogPresent: Boolean = withConn { c =>
    val rs = c.getMetaData.getTables(null, "cdc", "change_tables", null)
    try rs.next() finally rs.close()
  }

  private def newerCaptureInstance(): Option[String] =
    if (!terminateOnCaptureInstanceChange || !catalogPresent) None
    else {
      val sql = AnsiTranspile(
        SqlServerDialect.latestCaptureInstanceQuery, Seq(lit(captureInstance)))
      lastRow(sql, 1).map(_._1(0).toString.trim)
        .filter(_ != captureInstance) // an OLDER coexisting instance must not fire
    }

  private def assertSchemaUnchanged(): Unit = {
    newerCaptureInstance().foreach { fresh =>
      throw new CdcSchemaChangedException(
        s"a newer capture instance '$fresh' is live for the source table " +
          s"of '$captureInstance'; terminating for supervisor restart " +
          "(terminateOnCaptureInstanceChange=true) — the restart's " +
          "startup ladder (InstanceSwitch) decides snapshot/overlap handling")
    }
    val current = ctColumns()
    // Drift = the column set changed, or a projected column's SERIALIZED
    // type changed (precision-only differences within a serialization
    // class are not drift — the same equivalence the G6 decision uses).
    val drifted = current.keySet != expectedColumns.keySet ||
      expectedColumns.exists { case (name, exp) =>
        sparkTypeOf(current(name)).isEmpty ||
          sparkTypeOf(current(name)) != sparkTypeOf(exp)
      }
    if (drifted) {
      val decision = SchemaEvolution.requiresNewSnapshot(
        expectedColumns, current,
        SchemaEvolution.Probes(oldInstanceAvailable = true,
          tableIsSmall = true, colHasNonNull = hasNonNull))
      throw new CdcSchemaChangedException(
        s"capture instance '$captureInstance' schema changed under a running " +
          s"query (projection expects ${expectedColumns.keySet.toSeq.sorted.mkString(",")}; " +
          s"live table has ${current.keySet.toSeq.sorted.mkString(",")}); terminating for " +
          s"supervisor restart. Re-snapshot decision: ${decision.resnapshot} " +
          s"(${decision.reason})")
    }
  }

  /** Run `sql`, stream the result, return the LAST row's first n columns
    * (the boundary the probe queries put last by construction) plus the
    * row count (the lagging signal). */
  private def lastRow(sql: String, n: Int): Option[(IndexedSeq[AnyRef], Long)] =
    withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(sql)
        var last: IndexedSeq[AnyRef] = null
        var count = 0L
        while (rs.next()) { last = (1 to n).map(rs.getObject); count += 1 }
        rs.close()
        Option(last).map(r => (r, count))
      } finally st.close()
    }

  /** TOP(1) of the seek-ordered scan strictly after the Lowest sentinel
    * (no retained row sits AT the all-zero sentinel). */
  override def minAvailableChange(): Option[ChangeIndex] = {
    val (sl, sc, ss, so) = ChangeIndex.parts(ChangeIndex.Lowest)
    val tsql = SqlServerDialect.changeBoundaryQuery(captureInstance, 1)
    val sql = AnsiTranspile(tsql,
      Seq(lit(hex20(sl)), sc.toString, lit(hex20(ss)), so.toString))
    lastRow(sql, 4).map { case (r, _) =>
      ChangeIndex(
        ChangeIndex.lsnFromLong(parseHex20(r(0).toString)),
        r(1).asInstanceOf[Number].intValue(),
        ChangeIndex.lsnFromLong(parseHex20(r(2).toString)),
        r(3).asInstanceOf[Number].intValue())
    }
  }

  override def changeBoundary(start: ChangeIndex): Option[(ChangeIndex, Long)] = {
    assertSchemaUnchanged()
    val (sl, sc, ss, so) = ChangeIndex.parts(start)
    val tsql = SqlServerDialect.changeBoundaryQuery(captureInstance, batchSize)
    val sql = AnsiTranspile(tsql,
      Seq(lit(hex20(sl)), sc.toString, lit(hex20(ss)), so.toString))
    lastRow(sql, 4).map { case (r, n) =>
      (ChangeIndex(
        ChangeIndex.lsnFromLong(parseHex20(r(0).toString)),
        r(1).asInstanceOf[Number].intValue(),
        ChangeIndex.lsnFromLong(parseHex20(r(2).toString)),
        r(3).asInstanceOf[Number].intValue()), n)
    }
  }

  /** Descending TOP(1) over the CDC index — a single backward seek
    * ([[SqlServerDialect.maxChangeIndexQuery]]). */
  override def maxAvailableChange(): Option[ChangeIndex] = {
    val sql = AnsiTranspile(
      SqlServerDialect.maxChangeIndexQuery(captureInstance), Seq.empty)
    lastRow(sql, 4).map { case (r, _) =>
      ChangeIndex(
        ChangeIndex.lsnFromLong(parseHex20(r(0).toString)),
        r(1).asInstanceOf[Number].intValue(),
        ChangeIndex.lsnFromLong(parseHex20(r(2).toString)),
        r(3).asInstanceOf[Number].intValue())
    }
  }

  override def snapshotPageBoundary(below: Option[(Long, Long)]): Option[(Long, Long)] = {
    if (snapshotTable.isEmpty) return None
    val (schema, table) = snapshotTable.get
    val tsql = SqlServerDialect.snapshotBoundaryQuery(schema, table,
      CdcTableProvider.snapshotPk, firstRead = below.isEmpty, batchSize)
    val binds = below match {
      case Some((k, e)) => Seq(k.toString, e.toString)
      case None => Seq("0") // the placeholder @K0 of the unbounded page
    }
    lastRow(AnsiTranspile(tsql, binds), 2).map { case (r, _) =>
      (r(0).asInstanceOf[Number].longValue(), r(1).asInstanceOf[Number].longValue())
    }
  }

  override def changePartitions(start: (Long, Int, Long, Int),
      end: (Long, Int, Long, Int)): Array[InputPartition] = {
    val tsql = SqlServerDialect.changeWindowQuery(
      captureInstance, CdcTableProvider.changeValueFields)
    val sql = AnsiTranspile(tsql, Seq(
      lit(hex20(start._1)), start._2.toString, lit(hex20(start._3)), start._4.toString,
      lit(hex20(end._1)), end._2.toString, lit(hex20(end._3)), end._4.toString))
    Array(JdbcChangePartition(url, sql))
  }

  override def snapshotPartitions(upper: Option[(Long, Long)],
      lower: (Long, Long)): Array[InputPartition] = {
    val (schema, table) = snapshotTable.get
    val tsql = SqlServerDialect.snapshotWindowQuery(schema, table,
      CdcTableProvider.snapshotFields, removedFields = Set.empty,
      CdcTableProvider.snapshotPk, boundedAbove = upper.isDefined)
    val binds = Seq(lower._1.toString, lower._2.toString) ++
      upper.toSeq.flatMap(u => Seq(u._1.toString, u._2.toString))
    Array(JdbcSnapshotPartition(url, AnsiTranspile(tsql, binds)))
  }
}

/** A change-window split: rows of `file` with start < index <= end. */
private case class ChangeRangePartition(file: String,
    start: (Long, Int, Long, Int), end: (Long, Int, Long, Int)) extends InputPartition

/** A snapshot-page split: rows of `file` with lower <= key (< upper). */
private case class SnapshotRangePartition(file: String,
    upper: Option[(Long, Long)], lower: (Long, Long)) extends InputPartition

/** A JDBC change-window split: the complete range query for
  * start < index <= end; SELECT order = 4 index cols + changeValueFields. */
private case class JdbcChangePartition(url: String, sql: String) extends InputPartition

/** A JDBC snapshot-page split; SELECT order = snapshotFields. */
private case class JdbcSnapshotPartition(url: String, sql: String) extends InputPartition

/** Executor-side readers for the predicate-carrying splits. Parquet
  * splits scan a staged CDC file with the parquet-hadoop Group API
  * directly (no SparkSession on executors); JDBC splits execute their
  * range query over a per-partition connection. Per-split cost is one
  * sequential pass either way. */
private object CdcPredicateReaderFactory extends PartitionReaderFactory {

  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private def cmp4(a: (Long, Int, Long, Int), b: (Long, Int, Long, Int)): Int = {
    var c = java.lang.Long.compare(a._1, b._1)
    if (c == 0) c = Integer.compare(a._2, b._2)
    if (c == 0) c = java.lang.Long.compare(a._3, b._3)
    if (c == 0) c = Integer.compare(a._4, b._4)
    c
  }

  private def cmp2(a: (Long, Long), b: (Long, Long)): Int = {
    val c = java.lang.Long.compare(a._1, b._1)
    if (c == 0) java.lang.Long.compare(a._2, b._2) else c
  }

  // ---- null-safe Group accessors: every VALUE column of a CDC row is
  // nullable by construction (SURVEY §1.2 — a captured column can hold
  // NULL, and dropped columns surface as NULL); only the 4 change-index
  // components and the composite snapshot key are non-null by contract.
  private def isNull(g: Group, f: String): Boolean =
    g.getFieldRepetitionCount(f) == 0
  private def optStr(g: Group, f: String): UTF8String =
    if (isNull(g, f)) null else UTF8String.fromString(g.getString(f, 0))
  private def optLong(g: Group, f: String): Any =
    if (isNull(g, f)) null else g.getLong(f, 0)
  private def optDouble(g: Group, f: String): Any =
    if (isNull(g, f)) null else g.getDouble(f, 0)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case ChangeRangePartition(f, s, e) =>
        parquetReader(f, g => {
          val k = (g.getLong("lsn_num", 0), g.getInteger("command_id", 0),
            g.getLong("seqval_num", 0), g.getInteger("operation", 0))
          cmp4(k, s) > 0 && cmp4(k, e) <= 0
        })
      case SnapshotRangePartition(f, upper, lower) =>
        parquetReader(f, g => {
          val k = (g.getLong("user_id", 0), g.getLong("event_id", 0))
          cmp2(k, lower) >= 0 && upper.forall(u => cmp2(k, u) < 0)
        })
      case JdbcChangePartition(url, sql) =>
        jdbcReader(url, sql, rs => new GenericInternalRow(Array[Any](
          AnsiTranspile.parseHex20(rs.getString(1)),
          rs.getInt(2),
          AnsiTranspile.parseHex20(rs.getString(3)),
          rs.getInt(4),
          jLong(rs, 5), jLong(rs, 6), jStr(rs, 7), jDouble(rs, 8), jStr(rs, 9))))
      case JdbcSnapshotPartition(url, sql) =>
        // Snapshot rows carry the zero change-index sentinel (operation 0)
        // — the same envelope the parquet staging writes.
        jdbcReader(url, sql, rs => new GenericInternalRow(Array[Any](
          0L, 0, 0L, 0,
          rs.getLong(2), rs.getLong(1), jStr(rs, 3), jDouble(rs, 4), jStr(rs, 5))))
    }

  // ---- null-safe ResultSet accessors (JDBC getLong/getDouble return 0
  // for NULL; wasNull disambiguates).
  private def jStr(rs: java.sql.ResultSet, i: Int): UTF8String = {
    val s = rs.getString(i)
    if (s == null) null else UTF8String.fromString(s)
  }
  private def jLong(rs: java.sql.ResultSet, i: Int): Any = {
    val v = rs.getLong(i)
    if (rs.wasNull()) null else v
  }
  private def jDouble(rs: java.sql.ResultSet, i: Int): Any = {
    val v = rs.getDouble(i)
    if (rs.wasNull()) null else v
  }

  private def parquetReader(file: String,
      keep: Group => Boolean): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val reader: ParquetReader[Group] = ParquetReader
        .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(file))
        .withConf(new org.apache.hadoop.conf.Configuration())
        .build()
      private var current: Group = _

      override def next(): Boolean = {
        current = reader.read()
        while (current != null && !keep(current)) current = reader.read()
        current != null
      }

      override def get(): InternalRow = {
        val g = current
        new GenericInternalRow(Array[Any](
          g.getLong("lsn_num", 0), g.getInteger("command_id", 0),
          g.getLong("seqval_num", 0), g.getInteger("operation", 0),
          optLong(g, "event_id"), optLong(g, "user_id"),
          optStr(g, "event_type"), optDouble(g, "value"),
          optStr(g, "props")))
      }

      override def close(): Unit = reader.close()
    }

  private def jdbcReader(url: String, sql: String,
      mk: java.sql.ResultSet => InternalRow): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val conn = java.sql.DriverManager.getConnection(url)
      private val st = conn.createStatement()
      private val rs = st.executeQuery(sql)

      override def next(): Boolean = rs.next()
      override def get(): InternalRow = mk(rs)
      override def close(): Unit = {
        try rs.close() finally { try st.close() finally conn.close() }
      }
    }
}

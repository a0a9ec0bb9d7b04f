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

import graft.model.ChangeIndex

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
  * and this source exists to remove it. A JDBC deployment swaps the
  * parquet readers for per-partition keyset queries built from
  * [[SqlServerDialect.changeQuery]]; the offset/admission mechanics are
  * identical.
  *
  * Usage:
  *   spark.readStream.format("graft.sources.CdcTableProvider")
  *     .option("feedDir", dir).option("tableName", t)
  *     .option("batchSize", "2000").load()
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
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdcMicroBatchStream(
            merged.getOrElse("feeddir", sys.error("feedDir option required")),
            merged.getOrElse("tablename", "cdc_feed"),
            merged.getOrElse("batchsize", "2000").toInt,
            merged.get("snapshotdir"))
      }
    }
  }
}

/** Offset = the serialized CdcOffset for this one table. */
private case class CdcStreamOffset(offset: CdcOffset) extends Offset {
  override def json(): String = offset.json
}

private class CdcMicroBatchStream(feedDir: String, tableName: String,
    batchSize: Int, snapshotDir: Option[String])
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active

  private def pos(o: Offset): TablePosition =
    o.asInstanceOf[CdcStreamOffset].offset.tables
      .getOrElse(tableName, TablePosition(ChangeIndex.Lowest, initialSnapshot))

  private def initialSnapshot: SnapshotPosition =
    if (snapshotDir.isDefined) SnapshotNotStarted else SnapshotDone

  private def mkOffset(p: TablePosition): CdcStreamOffset =
    CdcStreamOffset(CdcOffset(Map(tableName -> p)))

  override def initialOffset(): Offset =
    mkOffset(TablePosition(ChangeIndex.Lowest, initialSnapshot))

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

  private def belowPredicate(k: Long, e: Long) =
    col("user_id") < k || (col("user_id") === k && col("event_id") < e)

  /** Boundary probe for the next reverse-keyset snapshot page: the MIN
    * composite key among the `batchSize` keys strictly below the bound
    * (A2's query shape, reduced to its last row). One job, one row back
    * to the driver; None when the page is empty (snapshot drained, G3). */
  private def snapshotPageBoundary(below: Option[(Long, Long)]): Option[(Long, Long)] = {
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

  private def idxParts(i: ChangeIndex): (Long, Int, Long, Int) =
    (java.nio.ByteBuffer.wrap(i.lsn.drop(2)).getLong, i.commandId,
      java.nio.ByteBuffer.wrap(i.seqval.drop(2)).getLong, i.operation)

  /** Boundary probe for the next change window: the MAX change index among
    * the `batchSize` rows strictly after `start` (A1's ordered TOP scan,
    * reduced to its last row). None when no new rows exist. */
  private def changeBoundary(start: ChangeIndex): Option[ChangeIndex] = {
    val (sl, sc, ss, so) = idxParts(start)
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
      Some(ChangeIndex(ChangeIndex.lsnFromLong(s.getLong(0)), s.getInt(1),
        ChangeIndex.lsnFromLong(s.getLong(2)), s.getInt(3)))
    }
  }

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
        snapshotPageBoundary(below) match {
          case None => mkOffset(p.copy(snapshot = SnapshotDone))
          case Some((u, e)) => mkOffset(p.copy(snapshot = SnapshotAt(keyHex(u, e))))
        }
      case SnapshotDone =>
        val end = changeBoundary(p.changeIndex).getOrElse(p.changeIndex)
        mkOffset(p.copy(changeIndex = end))
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl.latestOffset(start, limit) is used")

  private def listParquet(dir: String): Array[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(path).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  /** Partitions carry the offset-range PREDICATE and a file split — never
    * rows. Replay after restart therefore depends only on the committed
    * offset pair: re-planning a batch with a different configured
    * batchSize yields exactly the same rows (no limit() in this path). */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = pos(start); val e = pos(end)
    (s.snapshot, e.snapshot) match {
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
        listParquet(snapshotDir.get).map(f =>
          SnapshotRangePartition(f, upper, lower): InputPartition)
      case (sp, SnapshotDone) if sp != SnapshotDone =>
        Array.empty // the done-transition batch carries no rows
      case _ =>
        if (s.changeIndex >= e.changeIndex) Array.empty
        else listParquet(feedDir).map(f =>
          ChangeRangePartition(f, idxParts(s.changeIndex), idxParts(e.changeIndex)): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = CdcPredicateReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** A change-window split: rows of `file` with start < index <= end. */
private case class ChangeRangePartition(file: String,
    start: (Long, Int, Long, Int), end: (Long, Int, Long, Int)) extends InputPartition

/** A snapshot-page split: rows of `file` with lower <= key (< upper). */
private case class SnapshotRangePartition(file: String,
    upper: Option[(Long, Long)], lower: (Long, Long)) extends InputPartition

/** Executor-side parquet scan of a staged CDC file, filtered by the
  * partition's offset-range predicate. Uses the parquet-hadoop Group API
  * directly (no SparkSession on executors); per-file cost is one
  * sequential pass, and file splits give the same parallelism shape a
  * JDBC deployment gets from per-partition keyset queries. */
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

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (file, keep): (String, Group => Boolean) = partition match {
      case ChangeRangePartition(f, s, e) =>
        (f, g => {
          val k = (g.getLong("lsn_num", 0), g.getInteger("command_id", 0),
            g.getLong("seqval_num", 0), g.getInteger("operation", 0))
          cmp4(k, s) > 0 && cmp4(k, e) <= 0
        })
      case SnapshotRangePartition(f, upper, lower) =>
        (f, g => {
          val k = (g.getLong("user_id", 0), g.getLong("event_id", 0))
          cmp2(k, lower) >= 0 && upper.forall(u => cmp2(k, u) < 0)
        })
    }
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
          g.getLong("event_id", 0), g.getLong("user_id", 0),
          UTF8String.fromString(g.getString("event_type", 0)),
          g.getDouble("value", 0),
          UTF8String.fromString(g.getString("props", 0))))
      }

      override def close(): Unit = reader.close()
    }
  }
}

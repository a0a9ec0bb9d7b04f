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
  * Fixture mode (this implementation): the "change table" is a staged
  * parquet directory; the driver plans each poll window by running the
  * bounded ordered scan (A1's shape: `> start`, `<= ceiling`, ordered,
  * TOP batch) and ships the window's rows inside the InputPartition. A
  * JDBC deployment swaps `loadWindow` for per-partition readers that
  * execute [[SqlServerDialect.changeQuery]] against the database — the
  * offset/admission mechanics are identical.
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
  // pagination over non-unique keys cannot be lossless.
  private def keyHex(k: Long, e: Long): String = f"$k%016x$e%016x"
  // parseUnsignedLong round-trips the two's-complement hex of negative
  // keys; a 16-char value (an offset written before the composite-key
  // format) degrades losslessly to (key, MIN) = the old key-only bound.
  private def keyFromHex(h: String): (Long, Long) =
    if (h.length <= 16) (java.lang.Long.parseUnsignedLong(h, 16), Long.MinValue)
    else (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
      java.lang.Long.parseUnsignedLong(h.substring(16), 16))

  private def belowPredicate(k: Long, e: Long) =
    col("user_id") < k || (col("user_id") === k && col("event_id") < e)

  /** Next reverse-keyset snapshot page strictly below the composite
    * bound: descending, at most batchSize (A2's query shape). */
  private def snapshotPage(below: Option[(Long, Long)]): Array[org.apache.spark.sql.Row] = {
    val base = spark.read.schema(CdcTableProvider.schema)
      .parquet(snapshotDir.get)
    val bounded = below.map { case (k, e) => base.filter(belowPredicate(k, e)) }
      .getOrElse(base)
    bounded.orderBy(col("user_id").desc, col("event_id").desc)
      .limit(batchSize).collect()
  }

  override def deserializeOffset(json: String): Offset =
    CdcStreamOffset(CdcOffset.fromJson(json))

  /** Admission control: the snapshot dimension advances first — one
    * reverse-keyset page per trigger until the short-page probe declares
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
        val page = snapshotPage(below)
        if (page.isEmpty) mkOffset(p.copy(snapshot = SnapshotDone))
        else mkOffset(p.copy(snapshot = // min composite key of the page
          SnapshotAt(keyHex(page.last.getLong(5), page.last.getLong(4)))))
      case SnapshotDone =>
        val window = loadWindow(p.changeIndex)
        val end = if (window.isEmpty) p.changeIndex else toIndex(window.last)
        mkOffset(p.copy(changeIndex = end))
    }
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batchSize)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl.latestOffset(start, limit) is used")

  private def toIndex(r: org.apache.spark.sql.Row): ChangeIndex =
    ChangeIndex(ChangeIndex.lsnFromLong(r.getLong(0)), r.getInt(1),
      ChangeIndex.lsnFromLong(r.getLong(2)), r.getInt(3))

  /** The bounded ordered scan: rows strictly after `start`, in change
    * index order, at most batchSize (A1's query shape over the fixture). */
  private def loadWindow(start: ChangeIndex): Array[org.apache.spark.sql.Row] = {
    val startLsn = java.nio.ByteBuffer.wrap(start.lsn.drop(2)).getLong
    val startSeq = java.nio.ByteBuffer.wrap(start.seqval.drop(2)).getLong
    spark.read.schema(CdcTableProvider.schema).parquet(feedDir)
      .filter(struct(col("lsn_num"), col("command_id"), col("seqval_num"), col("operation")) >
        struct(lit(startLsn).as("lsn_num"), lit(start.commandId).as("command_id"),
          lit(startSeq).as("seqval_num"), lit(start.operation).as("operation")))
      .orderBy(col("lsn_num"), col("command_id"), col("seqval_num"), col("operation"))
      .limit(batchSize)
      .collect()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = pos(start); val e = pos(end)
    val rows: Array[org.apache.spark.sql.Row] = (s.snapshot, e.snapshot) match {
      case (sp, ep) if sp != ep && ep != SnapshotDone =>
        // A snapshot page: keys strictly below the start bound, down to
        // and including the end position's composite key.
        val upper = sp match {
          case SnapshotAt(h) => Some(keyFromHex(h))
          case _ => None
        }
        val (lk, le) = ep match {
          case SnapshotAt(h) => keyFromHex(h)
          case _ => (Long.MinValue, Long.MinValue)
        }
        snapshotPage(upper).filter { r =>
          val (u, e) = (r.getLong(5), r.getLong(4))
          u > lk || (u == lk && e >= le)
        }
      case (sp, SnapshotDone) if sp != SnapshotDone =>
        Array.empty // the done-transition batch carries no rows
      case _ =>
        if (s.changeIndex >= e.changeIndex) Array.empty
        else loadWindow(s.changeIndex).filter(r => toIndex(r) <= e.changeIndex)
    }
    if (rows.isEmpty) return Array.empty
    // Fixture mode ships the window's externalized values; a JDBC
    // deployment would instead give each partition its keyset query.
    Array(CdcRowsPartition(rows.map(r =>
      Array[Any](r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getDouble(7), r.getString(8)))))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[CdcRowsPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = {
            val v = rows(i)
            new GenericInternalRow(Array[Any](
              v(0), v(1), v(2), v(3), v(4), v(5),
              UTF8String.fromString(v(6).asInstanceOf[String]), v(7),
              UTF8String.fromString(v(8).asInstanceOf[String])))
          }
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class CdcRowsPartition(rows: Array[Array[Any]]) extends InputPartition

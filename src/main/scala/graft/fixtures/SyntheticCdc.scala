package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC-shaped derivation of the driver's `events` table.
  *
  * Plays the role of a SQL Server change table `cdc.<instance>_CT`
  * (FIXTURES.md §2; reference shape `cdc_kafka/sql_queries.py:218-267`).
  * Every derived column is pure integer/string arithmetic over `event_id`
  * so the exact same rows are computable by the DuckDB oracle — the SQL
  * text lives in [[SyntheticCdc.changeRowsSql]] and MUST stay semantically
  * identical to [[SyntheticCdc.changeRows]].
  *
  * Derivation (events has N rows, event_id 0..N-1):
  *   - lsn_num     = event_id / 8         (≈8 rows per transaction)
  *   - command_id  = (event_id % 8) / 2   (statement number in txn)
  *   - seqval_num  = event_id             (unique → total order is strict)
  *   - operation   = 1 + event_id % 4     (1=Delete 2=Insert 3=PreUpdate 4=PostUpdate)
  *   - mask_int    = 1 + event_id % 15 for updates, 15 (all 4 bits) otherwise
  *   - payload     = user_id, event_type, value, props (bit ordinals 0..3)
  * The 10-byte binary LSN/seqval used by the Spark-native ordering are the
  * big-endian encodings of the numeric forms, materialized with `unhex`.
  */
object SyntheticCdc {

  /** Payload column names in capture ordinal order (update-mask bits 0..3). */
  val payloadColumns: Seq[String] = Seq("user_id", "event_type", "value", "props")

  /** `events.parquet` normalized so `ts` is a microsecond `TimestampType`
    * regardless of how the driver generated the file. Two shapes have been
    * observed across testdata generations:
    *   - TIMESTAMP(NANOS) (unsupported by Spark's vectorized reader) —
    *     read as nanos-since-epoch via the legacy conf and truncated to
    *     micros with integer division (`div`, NOT `/`: long `/` is DOUBLE
    *     division and epoch-nanos exceed double's 53-bit mantissa, so the
    *     rounding can shift the rendered millisecond up by one);
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → `TIMESTAMP_NTZ` —
    *     cast to session-local TimestampType (the session is pinned UTC,
    *     so the wall-clock rendering matches DuckDB's naive read exactly).
    * Millisecond-level rendering — all the oracle compares — is identical
    * either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-tz timestamp
    }
  }

  val allColumnsJoined: String = payloadColumns.mkString(",")

  /** The synthetic change table as a DataFrame. Columns:
    * lsn_num, command_id, seqval_num, operation, mask_int,
    * lsn (binary 10), seqval (binary 10), lsn_hex, seqval_hex,
    * event_id, user_id, event_type, value, props, ts. */
  def changeRows(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    ev.select(
        col("event_id"),
        col("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props"),
        (col("event_id") / 8).cast("long").as("lsn_num"),
        ((col("event_id") % 8) / 2).cast("int").as("command_id"),
        col("event_id").as("seqval_num"),
        (lit(1) + col("event_id") % 4).cast("int").as("operation"))
      .withColumn("mask_int",
        when(col("operation") === 4 || col("operation") === 3,
          (lit(1) + col("event_id") % 15).cast("int"))
          .otherwise(lit(15)))
      .withColumn("lsn_hex", lpad(lower(hex(col("lsn_num"))), 20, "0"))
      .withColumn("seqval_hex", lpad(lower(hex(col("seqval_num"))), 20, "0"))
      .withColumn("lsn", unhex(col("lsn_hex")))
      .withColumn("seqval", unhex(col("seqval_hex")))
  }

  /** DuckDB SQL producing the same rows (minus the binary columns).
    * Use as `WITH change_rows AS (<this>) ...`. */
  val changeRowsSql: String =
    """SELECT
      |  event_id, ts, user_id, event_type, value, props,
      |  CAST(event_id // 8 AS BIGINT) AS lsn_num,
      |  CAST((event_id % 8) // 2 AS INT) AS command_id,
      |  event_id AS seqval_num,
      |  CAST(1 + event_id % 4 AS INT) AS operation,
      |  CAST(CASE WHEN (1 + event_id % 4) IN (3, 4)
      |       THEN 1 + event_id % 15 ELSE 15 END AS INT) AS mask_int,
      |  lpad(lower(to_hex(CAST(event_id // 8 AS BIGINT))), 20, '0') AS lsn_hex,
      |  lpad(lower(to_hex(event_id)), 20, '0') AS seqval_hex
      |FROM events""".stripMargin

  /** Companion `lsn_time_mapping` (FIXTURES.md §2): one row per transaction
    * LSN with its commit (max event) time. */
  def lsnTimeMapping(spark: SparkSession, sfDir: String): DataFrame =
    // Group on the LONG key only and re-derive the hex/binary forms after
    // the agg: lsn_hex/lsn are pure functions of lsn_num, so grouping on
    // all three is semantically identical but shuffles a (long, string20,
    // binary10) key and computes the derivations per ROW instead of per
    // GROUP. Post-agg derivation also lets Catalyst prune them entirely
    // for consumers (C1, F11) that only read (lsn_num, tran_end_time).
    changeRows(spark, sfDir)
      .groupBy(col("lsn_num"))
      .agg(max(col("ts")).as("tran_end_time"))
      .withColumn("lsn_hex", lpad(lower(hex(col("lsn_num"))), 20, "0"))
      .withColumn("lsn", unhex(col("lsn_hex")))

  val lsnTimeMappingSql: String =
    """SELECT lsn_num, lsn_hex, max(ts) AS tran_end_time
      |FROM change_rows GROUP BY lsn_num, lsn_hex""".stripMargin

  /** A second change stream (from `orders`, insert-only) whose LSN range
    * interleaves with the events stream — input to the global k-way merge
    * (SURVEY §2 E1). */
  def ordersChangeRows(spark: SparkSession, sfDir: String): DataFrame = {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    o.select(
        col("o_orderkey"),
        (col("o_orderkey") / 12).cast("long").as("lsn_num"),
        lit(0).as("command_id"),
        col("o_orderkey").as("seqval_num"),
        lit(2).as("operation"))
      .withColumn("lsn_hex", lpad(lower(hex(col("lsn_num"))), 20, "0"))
      .withColumn("seqval_hex", lpad(lower(hex(col("seqval_num"))), 20, "0"))
  }

  val ordersChangeRowsSql: String =
    """SELECT
      |  o_orderkey,
      |  CAST(o_orderkey // 12 AS BIGINT) AS lsn_num,
      |  0 AS command_id,
      |  o_orderkey AS seqval_num,
      |  2 AS operation,
      |  lpad(lower(to_hex(CAST(o_orderkey // 12 AS BIGINT))), 20, '0') AS lsn_hex,
      |  lpad(lower(to_hex(o_orderkey)), 20, '0') AS seqval_hex
      |FROM orders""".stripMargin
}

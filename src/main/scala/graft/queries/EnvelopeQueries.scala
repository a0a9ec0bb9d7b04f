package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.{functions => gf}
import graft.fixtures.SyntheticCdc

/** SURVEY §1.3 envelope + §2 group B/F scalar surface: the message-envelope
  * projection and the custom scalar functions (truncation, update-mask
  * decode, UUID sort order, row-hash, ISO formatting, as-of LSN lookup).
  */
object EnvelopeQueries {

  private val cr = SyntheticCdc.changeRowsSql
  private val ltm = SyntheticCdc.lsnTimeMappingSql
  private val names = SyntheticCdc.payloadColumns // capture-ordinal order

  /** Flagship: the full CDC message envelope (§1.3; `avro.py:360-404`,
    * `sql_queries.py:255-262`) — B1 operation filter, C1 transaction-time
    * join (broadcast), F1 LSN rendering, F3 update-mask decode, F8 ISO
    * event time, B4 `__`-projection. One row per published change event.
    */
  def cdcEnvelope(spark: SparkSession, dir: String): DataFrame = {
    val changes = SyntheticCdc.changeRows(spark, dir)
      .filter(col("operation").isin(1, 2, 4))
    val mapping = SyntheticCdc.lsnTimeMapping(spark, dir)
      .select(col("lsn_num"), col("tran_end_time"))
    changes.join(broadcast(mapping), Seq("lsn_num"), "inner")
      .select(
        col("operation").as("__operation"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("__event_time"),
        concat(lit("0x"), col("lsn_hex")).as("__log_lsn"),
        col("command_id").as("__command_id"),
        concat(lit("0x"), col("seqval_hex")).as("__log_seqval"),
        array_join(gf.mask_to_names(
          unhex(lpad(hex(col("mask_int")), 4, "0")), names), ",").as("__updated_fields"),
        col("event_id"), col("user_id"), col("event_type"), col("value"), col("props"))
  }

  private def maskCases(ref: String): String =
    names.zipWithIndex.map { case (n, i) =>
      s"CASE WHEN $ref & ${1 << i} <> 0 THEN '$n' END"
    }.mkString(", ")

  val envelopeSql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm)
       |SELECT c.operation AS "__operation",
       |       strftime(l.tran_end_time, '%Y-%m-%dT%H:%M:%S.%g') AS "__event_time",
       |       '0x' || c.lsn_hex AS "__log_lsn",
       |       c.command_id AS "__command_id",
       |       '0x' || c.seqval_hex AS "__log_seqval",
       |       concat_ws(',', ${maskCases("c.mask_int")}) AS "__updated_fields",
       |       c.event_id, c.user_id, c.event_type, c.value, c.props
       |FROM change_rows c JOIN lsn_time l USING (lsn_num)
       |WHERE c.operation IN (1, 2, 4)""".stripMargin

  // F3 ★ standalone update-mask decode (`avro.py:583-589`).
  def f3MaskDecode(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.changeRows(spark, dir)
      .select(col("event_id"), col("mask_int"),
        array_join(gf.mask_to_names(
          unhex(lpad(hex(col("mask_int")), 4, "0")), names), ",").as("changed_fields"))

  val f3Sql: String =
    s"""WITH change_rows AS ($cr)
       |SELECT event_id, mask_int,
       |       concat_ws(',', ${maskCases("mask_int")}) AS changed_fields
       |FROM change_rows""".stripMargin

  // B6 ★ UTF-8-boundary byte truncation with the (origLen, newLen) header
  // record (`tracked_tables.py:361-395,405-415`). Fixture strings are pure
  // ASCII so the DuckDB char-based oracle equals byte semantics; multibyte
  // safety is covered by the ScalaTest property suite.
  def b6Truncate(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.events(spark, dir)
      .select(col("event_id"), col("props"),
        gf.truncate_utf8(col("props"), 6).as("props_trunc"),
        octet_length(col("props")).as("orig_bytes"),
        octet_length(gf.truncate_utf8(col("props"), 6)).as("new_bytes"))

  val b6Sql: String =
    """SELECT event_id, props,
      |       CASE WHEN strlen(props) <= 6 THEN props ELSE substring(props, 1, 6) END AS props_trunc,
      |       CAST(strlen(props) AS INT) AS orig_bytes,
      |       CAST(strlen(CASE WHEN strlen(props) <= 6 THEN props ELSE substring(props, 1, 6) END) AS INT) AS new_bytes
      |FROM events""".stripMargin

  // B7 ★ row-hash key for PK-less tables: deterministic RFC 4122 v3 UUID
  // in the md5(fq-table-name) namespace (`tracked_tables.py:417-426`).
  // String-domain md5 recipe (see Kernels.rowUuid) replaces round-1's
  // SHA-1 uuid5 precisely so an independent SQL engine can replay it
  // (DuckDB has no sha1): d = md5(md5(seed) || name), then patch nibble 13
  // to '3' (version) and nibble 17 to (x & 3) | 8 (variant). Fields join
  // on U+0001 (chr(1) in the oracle) so adjacent values can't collide
  // across a field boundary. Exact vectors locked in ScalaTest.
  def b7RowHash(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.events(spark, dir)
      .select(col("event_id"),
        gf.row_uuid(lit("dbo.events"),
          concat_ws("\u0001", col("event_id"), col("user_id"),
            col("event_type"), col("props"))).as("row_hash"))

  val b7Sql: String =
    """WITH r AS (
      |  SELECT event_id,
      |         md5(md5('dbo.events') ||
      |             concat_ws(chr(1), event_id, user_id, event_type, props)) AS d
      |  FROM events)
      |SELECT event_id,
      |       substr(d,1,8) || '-' || substr(d,9,4) || '-3' || substr(d,14,3) || '-' ||
      |       substr('89ab', (strpos('0123456789abcdef', substr(d,17,1)) - 1) % 4 + 1, 1) ||
      |       substr(d,18,3) || '-' || substr(d,21,12) AS row_hash
      |FROM r""".stripMargin

  // F6 ★ SQL-Server-ordered UUID sort key (`validation.py:19-41`): uuids
  // synthesized from md5 so both engines derive identical inputs; ordering
  // by the permuted key must agree byte-for-byte.
  def f6UuidSort(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("o_orderkey").cast("string"))
    val uuid = concat(
      substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"), substring(h, 21, 12))
    spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), uuid.as("uuid"),
        lower(hex(gf.sqlserver_uuid_sort_key(uuid))).as("sort_key"))
      .orderBy(col("sort_key"))
      .limit(200)
  }

  // DuckDB: permute hex pairs per SqlServerUuidByteOrder (bytes 10..15,
  // 8..9, then 7..0 reversed); byte i = substr(h, 2*i+1, 2).
  private val uuidPermSql: String =
    graft.expr.Kernels.SqlServerUuidByteOrder
      .map(i => s"substr(h, ${2 * i + 1}, 2)").mkString(" || ")

  val f6Sql: String =
    s"""WITH u AS (
       |  SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
       |SELECT o_orderkey,
       |       substr(h,1,8) || '-' || substr(h,9,4) || '-' || substr(h,13,4) || '-' ||
       |       substr(h,17,4) || '-' || substr(h,21,12) AS uuid,
       |       $uuidPermSql AS sort_key
       |FROM u ORDER BY sort_key LIMIT 200""".stripMargin

  // F7 ★ case-insensitive key fold (`validation.py:49-51`).
  def f7Casefold(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.events(spark, dir)
      .groupBy(lower(col("event_type")).as("key_folded"))
      .agg(count(lit(1)).as("cnt"))

  val f7Sql: String =
    """SELECT lower(event_type) AS key_folded, count(*) AS cnt
      |FROM events GROUP BY 1""".stripMargin

  // F8 ★ ISO-8601 event-time formatting (`avro.py:518,731-734`).
  def f8IsoFormat(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.events(spark, dir)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("iso_time"))

  val f8Sql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%g') AS iso_time
      |FROM events WHERE event_id < 500""".stripMargin

  // F11 ★ time→LSN as-of lookup: smallest mapped LSN with commit time >= t
  // (`fn_cdc_map_time_to_lsn`, `sql_queries.py:399-412`).
  def f11AsofLsn(spark: SparkSession, dir: String): DataFrame =
    SyntheticCdc.lsnTimeMapping(spark, dir)
      .filter(col("tran_end_time") >= lit("2024-01-02 00:00:00").cast("timestamp"))
      .orderBy(col("tran_end_time"), col("lsn_num"))
      .limit(1)
      .select(col("lsn_hex"),
        date_format(col("tran_end_time"), "yyyy-MM-dd'T'HH:mm:ss.SSS").as("tran_end_iso"))

  val f11Sql: String =
    s"""WITH change_rows AS ($cr), lsn_time AS ($ltm)
       |SELECT lsn_hex, strftime(tran_end_time, '%Y-%m-%dT%H:%M:%S.%g') AS tran_end_iso
       |FROM lsn_time
       |WHERE tran_end_time >= TIMESTAMP '2024-01-02 00:00:00'
       |ORDER BY tran_end_time, lsn_num LIMIT 1""".stripMargin

  // F13 ★ (r11) — semi-structured payload extraction: the `props` column
  // is a JSON document (the reference ships raw column values into the
  // Avro envelope; real event payloads are JSON blobs, and every
  // downstream consumer's first step is path extraction). Per event:
  // pull `$.k` typed, flag malformed/missing paths instead of silently
  // nulling, then aggregate per event_type — the "parse once, summarize"
  // pass. Scale shape: JSON parsing is the narrow per-row cost (codegen'd
  // get_json_object — no UDF); the aggregate is map-side combined.
  def f13JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    SyntheticCdc.events(spark, dir).createOrReplaceTempView("events_t")
    spark.sql(
      """WITH parsed AS (
        |  SELECT event_type,
        |         CAST(get_json_object(props, '$.k') AS BIGINT) AS k,
        |         get_json_object(props, '$.absent') IS NULL AS no_absent
        |  FROM events_t)
        |SELECT event_type,
        |       count(*) AS n,
        |       CAST(count(k) AS BIGINT) AS n_parsed,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(sum(CASE WHEN no_absent THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_no_absent
        |FROM parsed GROUP BY event_type""".stripMargin)
  }

  val f13Sql: String =
    """WITH parsed AS (
      |  SELECT event_type,
      |         CAST(props->>'k' AS BIGINT) AS k,
      |         (props->>'absent') IS NULL AS no_absent
      |  FROM events)
      |SELECT event_type,
      |       count(*) AS n,
      |       CAST(count(k) AS BIGINT) AS n_parsed,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(min(k) AS BIGINT) AS min_k,
      |       CAST(max(k) AS BIGINT) AS max_k,
      |       CAST(sum(CASE WHEN no_absent THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_no_absent
      |FROM parsed GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f13_json_extract" -> (f13JsonExtract _),
    "envelope" -> (cdcEnvelope _),
    "f3_mask_decode" -> (f3MaskDecode _),
    "b6_truncate_utf8" -> (b6Truncate _),
    "b7_row_hash" -> (b7RowHash _),
    "f6_uuid_sort" -> (f6UuidSort _),
    "f7_casefold" -> (f7Casefold _),
    "f8_iso_format" -> (f8IsoFormat _),
    "f11_asof_lsn" -> (f11AsofLsn _))

  val oracle: Map[String, String] = Map(
    "f13_json_extract" -> f13Sql,
    "envelope" -> envelopeSql,
    "f3_mask_decode" -> f3Sql,
    "b6_truncate_utf8" -> b6Sql,
    "b7_row_hash" -> b7Sql,
    "f6_uuid_sort" -> f6Sql,
    "f7_casefold" -> f7Sql,
    "f8_iso_format" -> f8Sql,
    "f11_asof_lsn" -> f11Sql)
}

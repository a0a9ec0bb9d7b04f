package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.SyntheticCdc

/** Source-format coverage beyond parquet: the CSV and JSON-lines readers
  * with EXPLICIT schemas (never inference — at 100 TB schema inference is
  * an extra full scan and a correctness hazard), proven by round-trip:
  * the driver's parquet rows are written out in the text format and read
  * back, and the DuckDB oracle computes the same projection from parquet
  * directly — the compare passes only if the text encode/decode is
  * lossless, including the hostile cases (JSON payloads with quotes and
  * commas inside CSV fields, full-precision doubles, negative and
  * boundary integers).
  *
  * Scale notes: both readers are splittable scans (CSV/JSONL split on
  * newlines) and both push column pruning; the explicit schema keeps the
  * reader single-pass. Writing via a deterministic per-corpus temp dir
  * (overwritten each run) keeps the operators self-contained.
  */
object SourceFormatQueries {

  private def stage(spark: SparkSession, dir: String, fmt: String): String = {
    val out = s"${sys.props("java.io.tmpdir")}/graft_srcfmt_${dir.hashCode.toHexString}/$fmt"
    val ev = SyntheticCdc.events(spark, dir)
      .filter(col("event_id") % 3 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    val w = ev.coalesce(2).write.mode("overwrite")
    fmt match {
      case "csv" => w.option("header", "true").csv(out)
      case "json" => w.json(out)
      case "orc" => w.orc(out)
    }
    out
  }

  private val eventsSchema =
    "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"

  /** The projection both engines emit; value rides as full-precision
    * DOUBLE (shortest-round-trip text repr parses back bit-exact). */
  private def project(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), col("props"),
      length(col("props")).cast("int").as("props_len"))

  // A13 ★ (r11) — CSV round trip with explicit schema: JSON payloads
  // with embedded quotes/braces force the writer's quoting and the
  // reader's unescaping to agree exactly.
  def a13CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "csv")
    project(spark.read.schema(eventsSchema)
      .option("header", "true").csv(out))
  }

  // A14 ★ (r11) — JSON-lines round trip with explicit schema (the
  // interchange format half the world's event feeds arrive in).
  def a14JsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "json")
    project(spark.read.schema(eventsSchema).json(out))
  }

  // A15 ★ (r11) — ORC round trip: the other columnar container (Hive
  // lineage); binary-typed storage, so losslessness is expected — the
  // round trip proves the reader/writer pair and its predicate/prune
  // integration are actually wired.
  def a15OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = stage(spark, dir, "orc")
    project(spark.read.schema(eventsSchema).orc(out))
  }

  /** Oracle: the same projection straight from parquet — equality IS the
    * losslessness claim. */
  private val oracleSqlText =
    """SELECT event_id, user_id, event_type, value, props,
      |       CAST(length(props) AS INT) AS props_len
      |FROM events WHERE event_id % 3 = 0""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a13_csv_roundtrip" -> (a13CsvRoundtrip _),
    "a14_jsonl_roundtrip" -> (a14JsonlRoundtrip _),
    "a15_orc_roundtrip" -> (a15OrcRoundtrip _))

  val oracle: Map[String, String] = Map(
    "a13_csv_roundtrip" -> oracleSqlText,
    "a14_jsonl_roundtrip" -> oracleSqlText,
    "a15_orc_roundtrip" -> oracleSqlText)
}

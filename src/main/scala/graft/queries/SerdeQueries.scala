package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fixtures.SyntheticCdc
import graft.serde.AvroSerde

/** SURVEY §2 F4/F5 as an oracle-checked query: every change row is
  * Avro-encoded into a Confluent frame and decoded back inside the same
  * plan; the output equals the plain projection iff the codec roundtrips
  * byte-faithfully — the reference's every-50k self-check
  * (`avro.py:559-562`) run on EVERY row. */
object SerdeQueries {

  def f4AvroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = SyntheticCdc.changeRows(spark, dir)
      .select("event_id", "operation", "lsn_hex", "event_type", "value")
    val schema = src.schema
    val avro = AvroSerde.avroSchema(schema, "CdcValue", "graft", forceNullable = true)
    val enc = AvroSerde.rowEncoder(schema, "CdcValue", "graft", schemaId = 7)
    val dec = AvroSerde.frameDecoder(avro)
    src.map(r => enc.encode(r))
      .map { frame =>
        val (sid, rec) = dec.decode(frame)
        require(sid == 7, s"schema id mangled: $sid")
        (rec.get("event_id").asInstanceOf[Long],
          rec.get("operation").asInstanceOf[Int],
          rec.get("lsn_hex").toString,
          rec.get("event_type").toString,
          rec.get("value").asInstanceOf[Double])
      }
      .toDF("event_id", "operation", "lsn_hex", "event_type", "value")
  }

  val f4Sql: String =
    s"""WITH change_rows AS (${SyntheticCdc.changeRowsSql})
       |SELECT event_id, operation, lsn_hex, event_type, value FROM change_rows""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f4_avro_roundtrip" -> (f4AvroRoundtrip _))

  val oracle: Map[String, String] = Map(
    "f4_avro_roundtrip" -> f4Sql)
}

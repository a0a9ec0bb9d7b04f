package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.serde.AvroSerde

/** Unit coverage for the Avro/Confluent serde beyond the oracle-checked
  * roundtrip query: frame layout, nullability rules, and the decimal /
  * date / timestamp / binary type mappings. */
class AvroSerdeSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("qty", IntegerType),
    StructField("ok", BooleanType),
    StructField("price", DecimalType(10, 2)),
    StructField("payload", BinaryType),
    StructField("at", TimestampType),
    StructField("note", StringType)))

  test("Confluent frame: magic byte 0x00 + big-endian schema id") {
    val enc = AvroSerde.rowEncoder(schema, "T", "graft", schemaId = 0x01020304)
    val frame = enc.encode(Row(1L, 2, true, BigDecimal("12.34").underlying(),
      Array[Byte](1, 2), java.sql.Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.123456Z")),
      "hi"))
    assert(frame(0) == 0)
    assert(ByteBuffer.wrap(frame, 1, 4).getInt == 0x01020304)
  }

  test("roundtrip preserves every mapped type") {
    val avro = AvroSerde.avroSchema(schema, "T", "graft", forceNullable = true)
    val enc = AvroSerde.rowEncoder(schema, "T", "graft", schemaId = 9)
    val dec = AvroSerde.frameDecoder(avro)
    val ts = java.time.Instant.parse("2024-01-02T03:04:05.123456Z")
    val (sid, rec) = dec.decode(enc.encode(Row(
      42L, 7, false, BigDecimal("999.99").underlying(),
      Array[Byte](9, 8, 7), java.sql.Timestamp.from(ts), "héllo")))
    assert(sid == 9)
    assert(rec.get("id") == 42L && rec.get("qty") == 7 && rec.get("ok") == false)
    // decimal -> two's-complement unscaled bytes
    val unscaled = new java.math.BigInteger(
      bytes(rec.get("price").asInstanceOf[ByteBuffer]))
    assert(new java.math.BigDecimal(unscaled, 2).toPlainString == "999.99")
    assert(bytes(rec.get("payload").asInstanceOf[ByteBuffer]).toSeq == Seq[Byte](9, 8, 7))
    // timestamps serialize as ISO-8601 strings at this boundary
    assert(rec.get("at").toString == "2024-01-02T03:04:05.123456Z")
    assert(rec.get("note").toString == "héllo")
  }

  test("null handling: all value fields nullable under the CDC rule") {
    val avro = AvroSerde.avroSchema(schema, "T", "graft", forceNullable = true)
    val enc = AvroSerde.rowEncoder(schema, "T", "graft", schemaId = 1)
    val dec = AvroSerde.frameDecoder(avro)
    val (_, rec) = dec.decode(enc.encode(Row(null, null, null, null, null, null, null)))
    assert(schema.fieldNames.forall(f => rec.get(f) == null))
  }

  private def bytes(bb: ByteBuffer): Array[Byte] = {
    val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
  }
}

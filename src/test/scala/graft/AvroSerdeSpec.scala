package graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.serde.{AvroSerde, InMemorySchemaRegistry, IncompatibleSchemaException}

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

  test("type-spec overrides replace the default mapping and the encoder widens values") {
    val small = StructType(Seq(
      StructField("order_id", IntegerType), StructField("note", StringType)))
    val avro = AvroSerde.avroSchema(small, "T", "graft", forceNullable = true,
      typeOverrides = Map("order_id" -> "long"))
    val field = avro.getField("order_id").schema().getTypes.get(1)
    assert(field.getType == org.apache.avro.Schema.Type.LONG)
    // An Integer value must still serialize under the widened schema.
    val enc = new AvroSerde.RowEncoder(avro, 3)
    val (_, rec) = AvroSerde.frameDecoder(avro).decode(enc.encode(Row(7, "x")))
    assert(rec.get("order_id") == 7L)
  }

  test("alwaysUseLongs widens every integral column (--always-use-avro-longs)") {
    val avro = AvroSerde.avroSchema(schema, "T", "graft", forceNullable = true,
      alwaysUseLongs = true)
    assert(avro.getField("qty").schema().getTypes.get(1).getType ==
      org.apache.avro.Schema.Type.LONG)
    assert(avro.getField("note").schema().getTypes.get(1).getType ==
      org.apache.avro.Schema.Type.STRING)
  }

  test("alwaysUseAvroLongs end-to-end (r8): config-driven encoder survives a SQL column widening") {
    import graft.model.GraftConfig
    val reg = new InMemorySchemaRegistry
    val narrow = StructType(Seq(
      StructField("id", LongType), StructField("qty", IntegerType)))
    val widened = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))

    // Flag OFF: the schema carries int, so the upstream ALTER COLUMN to
    // BIGINT re-registers as long — an old int-reader cannot read long
    // writers, and the FORWARD gate rejects the evolution. This is the
    // operational failure the flag exists to preempt.
    val off = GraftConfig(alwaysUseAvroLongs = false)
    AvroSerde.encoderFor(off, reg, "t_off", narrow, "E")
    intercept[IncompatibleSchemaException] {
      AvroSerde.encoderFor(off, reg, "t_off", widened, "E")
    }

    // Flag ON: integral columns register as long from day one; the same
    // widening produces a byte-identical schema — SAME id, no gate, and
    // Int values already on the wire decode as Long.
    val on = GraftConfig(alwaysUseAvroLongs = true)
    val (idNarrow, enc) = AvroSerde.encoderFor(on, reg, "t_on", narrow, "E")
    val (idWide, _) = AvroSerde.encoderFor(on, reg, "t_on", widened, "E")
    assert(idNarrow === idWide,
      "with alwaysUseAvroLongs the widening must be a schema no-op")
    val writer = reg.byId(idNarrow).get
    assert(writer.getField("qty").schema().getTypes.get(1).getType ==
      org.apache.avro.Schema.Type.LONG)
    val (_, rec) = AvroSerde.frameDecoder(writer).decode(enc.encode(Row(1L, 7)))
    assert(rec.get("qty") === 7L)
    // The config namespace rides along too.
    assert(writer.getNamespace === on.avroSchemaNamespace)
  }

  test("registry: idempotent ids, id-resolved decode, FORWARD gate on evolution") {
    val reg = new InMemorySchemaRegistry
    val st = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val (id1, enc) = AvroSerde.registeredRowEncoder(reg, "dbo_events", st, "E", "graft")
    val (id1again, _) = AvroSerde.registeredRowEncoder(reg, "dbo_events", st, "E", "graft")
    assert(id1 == id1again, "same schema must keep its id")

    // Consumer resolves the writer schema from the frame's id alone.
    val frame = enc.encode(Row(5L, "hi"))
    val sid = ByteBuffer.wrap(frame, 1, 4).getInt
    assert(sid == id1)
    val writerSchema = reg.byId(sid).get
    val (_, rec) = AvroSerde.frameDecoder(writerSchema).decode(frame)
    assert(rec.get("id") == 5L && rec.get("v").toString == "hi")

    // Compatible evolution (new nullable field with default): new id.
    val evolved = StructType(st.fields :+ StructField("extra", StringType))
    val (id2, _) = AvroSerde.registeredRowEncoder(reg, "dbo_events", evolved, "E", "graft")
    assert(id2 != id1)
    assert(reg.latest("dbo_events-value").map(_._1).contains(id2))

    // Incompatible evolution (field type change) is rejected.
    val broken = StructType(Seq(StructField("id", StringType), StructField("v", StringType)))
    intercept[IncompatibleSchemaException] {
      AvroSerde.registeredRowEncoder(reg, "dbo_events", broken, "E", "graft")
    }
    // Keys register under their own subject and stay non-null.
    val (keyId, _) = AvroSerde.registeredRowEncoder(reg, "dbo_events",
      StructType(Seq(StructField("id", LongType, nullable = false))), "K", "graft",
      isKey = true)
    assert(reg.latest("dbo_events-key").map(_._1).contains(keyId))
    assert(reg.byId(keyId).get.getField("id").schema().getType ==
      org.apache.avro.Schema.Type.LONG)
  }

  private def bytes(bb: ByteBuffer): Array[Byte] = {
    val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
  }
}

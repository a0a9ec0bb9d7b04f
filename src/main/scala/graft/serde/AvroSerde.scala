package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro serialization with Confluent wire framing (SURVEY §2 F4/F5).
  *
  * Schema-generation rules follow the reference (`serializers/avro.py:
  * 270-343`): every VALUE field is nullable (CDC change tables make all
  * columns nullable), KEY fields are non-null; decimals are bytes with
  * the decimal logical type; datetimes serialize as ISO-8601 strings at
  * this boundary. The frame is magic byte 0x00 + big-endian 4-byte schema
  * id + Avro binary body (`avro.py:514-516`).
  *
  * Scale: writers/readers are allocated once per partition and reused
  * across rows (see [[AvroSerde.rowEncoder]]) — per-row codec setup is
  * the classic serializer bottleneck at 100 TB.
  */
object AvroSerde {

  /** Build the Avro record schema for a Spark struct. `forceNullable`
    * applies the all-value-fields-nullable rule.
    *
    * `typeOverrides` maps a column name to an Avro type spec — a bare
    * primitive name ("long") or a JSON schema fragment — replacing the
    * default Spark→Avro mapping for that field (reference
    * `avro.py:654-664`: future-proof a 32-bit INT column as Avro long
    * before the DB migration happens). `alwaysUseLongs` widens every
    * integral column the same way (`--always-use-avro-longs`). Overrides
    * change the generated schema only; the encoder widens integral/float
    * values to match, any other mismatch is the caller's contract. */
  def avroSchema(st: StructType, recordName: String, namespace: String,
      forceNullable: Boolean, typeOverrides: Map[String, String] = Map.empty,
      alwaysUseLongs: Boolean = false): Schema = {
    val fields = st.fields.map { f =>
      val base = typeOverrides.get(f.name) match {
        case Some(spec) => parseTypeSpec(spec)
        case None =>
          val b = baseType(f.dataType)
          if (alwaysUseLongs && b.getType == Schema.Type.INT)
            Schema.create(Schema.Type.LONG)
          else b
      }
      val (schema, default) =
        if (forceNullable || f.nullable)
          (Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava),
            Schema.Field.NULL_DEFAULT_VALUE)
        else (base, null)
      new Schema.Field(f.name, schema, null, default)
    }
    val rec = Schema.createRecord(recordName, null, namespace, false)
    rec.setFields(fields.toList.asJava)
    rec
  }

  private def parseTypeSpec(spec: String): Schema = {
    val trimmed = spec.trim
    if (trimmed.startsWith("{") || trimmed.startsWith("["))
      new Schema.Parser().parse(trimmed)
    else Schema.create(Schema.Type.valueOf(trimmed.toUpperCase))
  }

  private def baseType(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType | TimestampType => Schema.create(Schema.Type.STRING) // ISO-8601
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case ArrayType(et, _) =>
      Schema.createArray(baseType(et))
    case other => sys.error(s"unsupported Avro mapping for $other")
  }

  /** Per-partition reusable encoder: feed it Rows, get Confluent frames. */
  final class RowEncoder(schema: Schema, schemaId: Int) extends Serializable {
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val out = new ByteArrayOutputStream(256)
    @transient private var encoder: BinaryEncoder = _

    def encode(row: Row): Array[Byte] = {
      val rec = new GenericData.Record(schema)
      schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
        rec.put(f.pos(), toAvro(row, i, f.schema()))
      }
      out.reset()
      out.write(0) // Confluent magic byte
      out.write(ByteBuffer.allocate(4).putInt(schemaId).array())
      encoder = EncoderFactory.get().binaryEncoder(out, encoder)
      writer.write(rec, encoder)
      encoder.flush()
      out.toByteArray
    }
  }

  private def toAvro(row: Row, i: Int, fieldSchema: Schema): AnyRef = {
    if (row.isNullAt(i)) return null
    val effective = unionNonNull(fieldSchema)
    row.get(i) match {
      case b: Array[Byte] => ByteBuffer.wrap(b)
      case d: java.math.BigDecimal =>
        ByteBuffer.wrap(d.unscaledValue().toByteArray)
      case d: scala.math.BigDecimal =>
        ByteBuffer.wrap(d.underlying().unscaledValue().toByteArray)
      case t: java.sql.Timestamp => t.toInstant.toString
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt: java.lang.Integer
      case d: java.time.LocalDate => d.toEpochDay.toInt: java.lang.Integer
      case s: Seq[_] => s.map(_.asInstanceOf[AnyRef]).asJava
      case other if effective.getType == Schema.Type.STRING => other.toString
      // Widen under a type-overridden schema: the Java Avro writer is
      // strict about boxed types (an Integer cannot write as `long`).
      case n: java.lang.Number if effective.getType == Schema.Type.LONG =>
        java.lang.Long.valueOf(n.longValue())
      case n: java.lang.Number if effective.getType == Schema.Type.DOUBLE =>
        java.lang.Double.valueOf(n.doubleValue())
      case other => other.asInstanceOf[AnyRef]
    }
  }

  private def unionNonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  def rowEncoder(st: StructType, recordName: String, namespace: String,
      schemaId: Int, forceNullable: Boolean = true): RowEncoder =
    new RowEncoder(avroSchema(st, recordName, namespace, forceNullable), schemaId)

  /** Registry-integrated encoder (`avro.py:632-652`): generate the schema
    * (with overrides), register it under the Confluent subject convention
    * (`<topic>-key` / `<topic>-value`), and frame every row with the id
    * the registry assigned — the id a consumer resolves back through
    * [[SchemaRegistryClient.byId]]. */
  def registeredRowEncoder(registry: SchemaRegistryClient, topic: String,
      st: StructType, recordName: String, namespace: String,
      isKey: Boolean = false, forceNullable: Boolean = true,
      typeOverrides: Map[String, String] = Map.empty,
      alwaysUseLongs: Boolean = false): (Int, RowEncoder) = {
    val schema = avroSchema(st, recordName, namespace,
      // KEY fields stay non-null (reference rule); values force-nullable.
      forceNullable = forceNullable && !isKey, typeOverrides, alwaysUseLongs)
    val subject = s"$topic-${if (isKey) "key" else "value"}"
    val id = registry.register(subject, schema)
    (id, new RowEncoder(schema, id))
  }

  /** Config-driven registered encoder (r8): the G7 config surface meets
    * F4 here — `alwaysUseAvroLongs` (the reference's
    * `--always-use-avro-longs`, `options.py`/`avro.py`: widen every
    * integral column to Avro long so a later SQL column widening is not
    * a schema-registry incompatibility) and `avroSchemaNamespace` flow
    * from [[graft.model.GraftConfig]] instead of per-call-site
    * arguments a wiring path could forget. */
  def encoderFor(cfg: graft.model.GraftConfig, registry: SchemaRegistryClient,
      topic: String, st: StructType, recordName: String,
      isKey: Boolean = false,
      typeOverrides: Map[String, String] = Map.empty): (Int, RowEncoder) =
    registeredRowEncoder(registry, topic, st, recordName,
      cfg.avroSchemaNamespace, isKey = isKey,
      typeOverrides = typeOverrides,
      alwaysUseLongs = cfg.alwaysUseAvroLongs)

  /** Per-partition reusable Confluent-frame decoder. */
  final class FrameDecoder(schemaJson: String) extends Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    @transient private var decoder: BinaryDecoder = _

    /** Returns (schemaId, record). */
    def decode(frame: Array[Byte]): (Int, GenericRecord) = {
      require(frame.length > 5 && frame(0) == 0, "not a Confluent-framed message")
      val schemaId = ByteBuffer.wrap(frame, 1, 4).getInt
      decoder = DecoderFactory.get().binaryDecoder(frame, 5, frame.length - 5, decoder)
      (schemaId, reader.read(null, decoder))
    }
  }

  def frameDecoder(schema: Schema): FrameDecoder = new FrameDecoder(schema.toString)
}

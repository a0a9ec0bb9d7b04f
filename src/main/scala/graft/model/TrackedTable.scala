package graft.model

import org.apache.spark.sql.types._

/** Column metadata for a tracked source column.
  * Mirrors `TrackedField` (`cdc_kafka/tracked_tables.py:17-34`): name, SQL
  * type name, change-table ordinal, primary-key ordinal (0 = not a key),
  * decimal precision/scale, and an optional UTF-8 byte truncation limit. */
final case class TrackedFieldMeta(
    name: String,
    sqlTypeName: String,
    changeTableOrdinal: Int,
    primaryKeyOrdinal: Int = 0,
    decimalPrecision: Int = 0,
    decimalScale: Int = 0,
    truncateAfterBytes: Long = 0L) {

  def isKey: Boolean = primaryKeyOrdinal > 0

  /** SQL Server type name → Spark type (SURVEY §1.2 mapping table). */
  def sparkType: DataType = sqlTypeName.toLowerCase match {
    case "decimal" | "numeric" | "money" | "smallmoney" =>
      DecimalType(if (decimalPrecision > 0) decimalPrecision else 18, decimalScale)
    case "bigint" => LongType
    case "int" | "smallint" | "tinyint" => IntegerType
    case "bit" => BooleanType
    case "float" => DoubleType
    case "real" => FloatType
    case "date" => DateType
    case "time" => IntegerType // millis since midnight; Spark has no TimeType
    case "datetime" | "datetime2" | "datetimeoffset" | "smalldatetime" => TimestampType
    case "char" | "nchar" | "varchar" | "nvarchar" | "text" | "ntext" | "xml" => StringType
    case "uniqueidentifier" => StringType
    case "binary" | "varbinary" | "image" | "rowversion" => BinaryType
    case other => sys.error(s"unmapped SQL Server type: $other")
  }

  def toStructField: StructField = {
    val md = new MetadataBuilder()
      .putString("sqlTypeName", sqlTypeName)
      .putLong("changeTableOrdinal", changeTableOrdinal.toLong)
      .putLong("primaryKeyOrdinal", primaryKeyOrdinal.toLong)
      .putLong("truncateAfterBytes", truncateAfterBytes)
      .build()
    // CDC change tables force every value column nullable
    // (`serializers/avro.py:283-290`); key fields stay non-null in the key
    // schema but the value schema carries them nullable too.
    StructField(name, sparkType, nullable = true, md)
  }
}

/** A followed source table: identity, destination topic, fields.
  * Mirrors `TrackedTable` (`cdc_kafka/tracked_tables.py:37-82`). */
final case class TrackedTableMeta(
    schemaName: String,
    tableName: String,
    captureInstanceName: String,
    topicName: String,
    fields: Seq[TrackedFieldMeta]) {

  def fqName: String = s"$schemaName.$tableName"
  def changeTableName: String = s"cdc.${captureInstanceName}_CT"
  def keyFields: Seq[TrackedFieldMeta] =
    fields.filter(_.isKey).sortBy(_.primaryKeyOrdinal)
  def hasPk: Boolean = keyFields.nonEmpty
  def valueSchema: StructType = StructType(fields.map(_.toStructField))
  def keySchema: StructType = StructType(
    keyFields.map(f => f.toStructField.copy(nullable = false)))
}

/** Builder for the fixed message envelope prepended to every payload
  * (SURVEY §1.3; `sql_queries.py:255-262`, `serializers/avro.py:360-404`). */
object Envelope {
  val OperationField = "__operation"
  val EventTimeField = "__event_time"
  val LogLsnField = "__log_lsn"
  val CommandIdField = "__command_id"
  val LogSeqvalField = "__log_seqval"
  val UpdatedFieldsField = "__updated_fields"
  val RowHashField = "_row_hash" // PK-less key (`constants.py:29`)

  val metadataFieldNames: Seq[String] = Seq(
    OperationField, EventTimeField, LogLsnField, CommandIdField,
    LogSeqvalField, UpdatedFieldsField)

  /** Envelope struct fields: `__operation`/`__event_time` non-null;
    * LSN members null for snapshot rows (`avro.py:360-404`). */
  val schemaPrefix: Seq[StructField] = Seq(
    StructField(OperationField, StringType, nullable = false),
    StructField(EventTimeField, StringType, nullable = false),
    StructField(LogLsnField, StringType, nullable = true),
    StructField(CommandIdField, IntegerType, nullable = true),
    StructField(LogSeqvalField, StringType, nullable = true),
    StructField(UpdatedFieldsField, ArrayType(StringType, containsNull = false),
      nullable = false))

  def messageSchema(table: TrackedTableMeta): StructType =
    StructType(schemaPrefix ++ table.valueSchema.fields)
}

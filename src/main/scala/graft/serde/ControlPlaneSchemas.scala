package graft.serde

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}

import graft.model.{ChangeIndex, CdcOperation}

/** The reference engine's CONTROL-PLANE Avro schemas: the progress-tracking
  * topic (consumer-group-free offset persistence) and the snapshot-logging
  * topic (snapshot lifecycle audit trail), wire-compatible with
  * `cdc_kafka/serializers/avro.py:35-196`.
  *
  * The engine itself checkpoints through Structured Streaming's offset log
  * ([[graft.sources.CdcOffset]]) — functionally equivalent and
  * transactional — so these schemas exist for INTEROP: a migration tool
  * reading a reference deployment's progress topic (to seed a Spark
  * checkpoint) or writing one (to hand a pipeline back) needs the exact
  * record layout, including the v2 union-of-two-records `last_ack_position`
  * and the `map<["string","long"]>` snapshot key payloads, neither of
  * which the data-plane serde ([[AvroSerde]]) generates from a Spark
  * schema.
  *
  * Schemas are parsed from literal JSON — they ARE the published wire
  * contract, so generation would only obscure the comparison against the
  * reference. Field-by-field:
  *   - progress key (`avro.py:36-57`): topic_name + progress_kind enum
  *     {change_rows, snapshot_rows}.
  *   - progress value (`avro.py:58-131`): source/change table names, two
  *     DEPRECATED nullable fields kept for upgrade compatibility
  *     (`last_ack_partition`/`last_ack_offset`), and `last_ack_position` —
  *     a UNION of a change_rows_progress record (lsn/command id/seqval/
  *     operation enum) and a snapshot_rows_progress record (key_fields
  *     map with string-or-long values).
  *   - snapshot-logging value (`avro.py:133-196`): action audit record
  *     with nullable `map<long>` partition watermarks and nullable
  *     snapshot-index maps.
  *   - metrics key (`avro.py:198-210`): metrics_namespace.
  */
object ControlPlaneSchemas {

  val Namespace = "cdc_to_kafka"
  val ChangeRowsKind = "change_rows"
  val SnapshotRowsKind = "snapshot_rows"

  private def parse(json: String): Schema = new Schema.Parser().parse(json)

  /** `cdc_to_kafka__progress_tracking_v2__key` (`avro.py:36-57`). */
  val progressKeySchema: Schema = parse(s"""
    {"name": "${Namespace}__progress_tracking_v2__key",
     "namespace": "$Namespace", "type": "record", "fields": [
       {"name": "topic_name", "type": "string"},
       {"name": "progress_kind", "type": {"type": "enum", "name": "progress_kind",
         "symbols": ["$ChangeRowsKind", "$SnapshotRowsKind"]}}]}""")

  /** `cdc_to_kafka__progress_tracking_v2__value` (`avro.py:58-131`). */
  val progressValueSchema: Schema = parse(s"""
    {"name": "${Namespace}__progress_tracking_v2__value",
     "namespace": "$Namespace", "type": "record", "fields": [
       {"name": "source_table_name", "type": "string"},
       {"name": "change_table_name", "type": "string"},
       {"name": "last_ack_partition", "type": ["null", "int"]},
       {"name": "last_ack_offset", "type": ["null", "long"]},
       {"name": "last_ack_position", "type": [
         {"type": "record", "name": "${ChangeRowsKind}_progress",
          "namespace": "$Namespace", "fields": [
            {"name": "__log_lsn", "type": "string"},
            {"name": "__command_id", "type": "int", "default": 1},
            {"name": "__log_seqval", "type": "string"},
            {"name": "__operation", "type": {"type": "enum", "name": "__operation",
              "symbols": ["Snapshot", "Delete", "Insert", "PreUpdate", "PostUpdate"]}}]},
         {"type": "record", "name": "${SnapshotRowsKind}_progress",
          "namespace": "$Namespace", "fields": [
            {"name": "key_fields", "type": {"type": "map",
              "values": ["string", "long"]}}]}]}]}""")

  /** `cdc_to_kafka__snapshot_logging_v1__value` (`avro.py:133-196`). */
  val snapshotLoggingValueSchema: Schema = parse(s"""
    {"name": "${Namespace}__snapshot_logging_v1__value",
     "namespace": "$Namespace", "type": "record", "fields": [
       {"name": "topic_name", "type": "string"},
       {"name": "table_name", "type": "string"},
       {"name": "action", "type": "string"},
       {"name": "process_hostname", "type": "string"},
       {"name": "event_time_utc", "type": "string"},
       {"name": "key_schema_id", "type": ["null", "long"]},
       {"name": "value_schema_id", "type": ["null", "long"]},
       {"name": "partition_watermarks_low", "type": ["null",
         {"type": "map", "values": "long"}]},
       {"name": "partition_watermarks_high", "type": ["null",
         {"type": "map", "values": "long"}]},
       {"name": "starting_snapshot_index", "type": ["null",
         {"type": "map", "values": ["string", "long"]}]},
       {"name": "ending_snapshot_index", "type": ["null",
         {"type": "map", "values": ["string", "long"]}]}]}""")

  /** `cdc_to_kafka__metrics_v2__key` (`avro.py:198-210`). */
  val metricsKeySchema: Schema = parse(s"""
    {"name": "${Namespace}__metrics_v2__key",
     "namespace": "$Namespace", "type": "record", "fields": [
       {"name": "metrics_namespace", "type": "string"}]}""")

  // ── Typed views over the wire records ─────────────────────────────────

  /** A progress-topic position: either a change-log index or a snapshot
    * keyset position (`progress_tracking.py`'s ProgressEntry split). */
  sealed trait AckPosition
  final case class ChangeAck(index: ChangeIndex) extends AckPosition
  /** Snapshot key fields; values are string-or-long per the union. */
  final case class SnapshotAck(keyFields: Map[String, Either[String, Long]])
      extends AckPosition

  final case class ProgressRecord(
      topicName: String, kind: String,
      sourceTableName: String, changeTableName: String,
      position: AckPosition)

  private def positionSchemas = {
    val union = progressValueSchema.getField("last_ack_position").schema()
    (union.getTypes.get(0), union.getTypes.get(1))
  }

  /** Build the (key, value) GenericRecord pair for a progress entry —
    * what a compat writer publishes to a reference progress topic. */
  def toRecords(p: ProgressRecord): (GenericRecord, GenericRecord) = {
    val key = new GenericData.Record(progressKeySchema)
    key.put("topic_name", p.topicName)
    key.put("progress_kind",
      new GenericData.EnumSymbol(
        progressKeySchema.getField("progress_kind").schema(), p.kind))

    val value = new GenericData.Record(progressValueSchema)
    value.put("source_table_name", p.sourceTableName)
    value.put("change_table_name", p.changeTableName)
    value.put("last_ack_partition", null) // deprecated as of v4
    value.put("last_ack_offset", null)    // deprecated as of v4
    val (changeSchema, snapSchema) = positionSchemas
    val pos: GenericRecord = p.position match {
      case ChangeAck(idx) =>
        val r = new GenericData.Record(changeSchema)
        r.put("__log_lsn", idx.lsnHex)
        r.put("__command_id", idx.commandId)
        r.put("__log_seqval", idx.seqvalHex)
        r.put("__operation", new GenericData.EnumSymbol(
          changeSchema.getField("__operation").schema(),
          CdcOperation.names(idx.operation)))
        r
      case SnapshotAck(kf) =>
        val r = new GenericData.Record(snapSchema)
        r.put("key_fields", kf.map { case (k, v) =>
          k -> v.fold(identity[String], java.lang.Long.valueOf)
        }.asJava)
        r
    }
    value.put("last_ack_position", pos)
    (key, value)
  }

  /** Decode a progress (key, value) record pair back to the typed view —
    * what a compat reader does with a reference progress topic before
    * seeding a Spark checkpoint. Union-branch dispatch is by record name,
    * as the reference reader does (`progress_tracking.py` kind switch). */
  def fromRecords(key: GenericRecord, value: GenericRecord): ProgressRecord = {
    val pos = value.get("last_ack_position").asInstanceOf[GenericRecord]
    val position: AckPosition =
      if (pos.getSchema.getName == s"${ChangeRowsKind}_progress")
        ChangeAck(ChangeIndex(
          ChangeIndex.fromHex(pos.get("__log_lsn").toString),
          pos.get("__command_id").asInstanceOf[Int],
          ChangeIndex.fromHex(pos.get("__log_seqval").toString),
          CdcOperation.ids(pos.get("__operation").toString)))
      else
        SnapshotAck(pos.get("key_fields")
          .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
            case (k, v: java.lang.Long) => k.toString -> Right(v.longValue())
            case (k, v) => k.toString -> Left(v.toString)
          }.toMap)
    ProgressRecord(
      key.get("topic_name").toString,
      key.get("progress_kind").toString,
      value.get("source_table_name").toString,
      value.get("change_table_name").toString,
      position)
  }
}

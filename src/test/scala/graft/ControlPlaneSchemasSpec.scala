package graft

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{CdcOperation, ChangeIndex}
import graft.serde.ControlPlaneSchemas
import graft.serde.ControlPlaneSchemas._

/** Control-plane interop schemas (`serializers/avro.py:35-210`): the
  * progress-tracking union-of-two-records value and the snapshot-logging
  * watermark maps must survive a REAL Avro binary round-trip — that is the
  * wire a reference deployment's progress topic carries. */
class ControlPlaneSchemasSpec extends AnyFunSuite {

  private def roundTrip(r: GenericRecord): GenericRecord = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](r.getSchema).write(r, enc)
    enc.flush()
    val dec = DecoderFactory.get().binaryDecoder(out.toByteArray, null)
    new GenericDatumReader[GenericRecord](r.getSchema).read(null, dec)
  }

  test("schema fullnames and layout match the reference contract") {
    assert(progressKeySchema.getFullName ===
      "cdc_to_kafka.cdc_to_kafka__progress_tracking_v2__key")
    assert(progressValueSchema.getFullName ===
      "cdc_to_kafka.cdc_to_kafka__progress_tracking_v2__value")
    assert(snapshotLoggingValueSchema.getFullName ===
      "cdc_to_kafka.cdc_to_kafka__snapshot_logging_v1__value")
    assert(metricsKeySchema.getFullName ===
      "cdc_to_kafka.cdc_to_kafka__metrics_v2__key")
    // The v2 position union: change_rows_progress first, snapshot second.
    val union = progressValueSchema.getField("last_ack_position").schema()
    assert(union.getTypes.asScala.map(_.getName) ===
      Seq("change_rows_progress", "snapshot_rows_progress"))
    // Deprecated-but-present upgrade-compat fields are nullable.
    assert(progressValueSchema.getField("last_ack_partition").schema()
      .getTypes.asScala.head.getName === "null")
    // The operation enum carries all five reference symbols in id order.
    val op = union.getTypes.get(0).getField("__operation").schema()
    assert(op.getEnumSymbols.asScala ===
      (0 to 4).map(CdcOperation.names))
  }

  test("change_rows progress round-trips through Avro binary") {
    val idx = ChangeIndex(
      ChangeIndex.fromHex("0x0000001a0000002b0003"), 7,
      ChangeIndex.fromHex("0x0000001a0000002b0004"), CdcOperation.PostUpdate)
    val p = ProgressRecord("topic.a", ChangeRowsKind, "dbo.orders",
      "dbo_orders_ct", ChangeAck(idx))
    val (k, v) = toRecords(p)
    val got = fromRecords(roundTrip(k), roundTrip(v))
    assert(got === p)
    assert(got.position.asInstanceOf[ChangeAck].index.lsnHex ===
      "0x0000001a0000002b0003")
  }

  test("snapshot_rows progress round-trips, mixed string/long key fields") {
    val p = ProgressRecord("topic.b", SnapshotRowsKind, "dbo.customer",
      "dbo_customer_ct",
      SnapshotAck(Map("cust_id" -> Right(42L), "region" -> Left("EMEA"))))
    val (k, v) = toRecords(p)
    val got = fromRecords(roundTrip(k), roundTrip(v))
    assert(got === p)
  }

  test("snapshot-logging record carries nullable map<long> watermarks") {
    val r = new GenericData.Record(snapshotLoggingValueSchema)
    r.put("topic_name", "t"); r.put("table_name", "dbo.t")
    r.put("action", "started"); r.put("process_hostname", "host-1")
    r.put("event_time_utc", "2026-08-12T00:00:00Z")
    r.put("key_schema_id", null); r.put("value_schema_id", 17L)
    r.put("partition_watermarks_low", Map("0" -> java.lang.Long.valueOf(5L)).asJava)
    r.put("partition_watermarks_high", null)
    r.put("starting_snapshot_index",
      Map("id" -> (java.lang.Long.valueOf(9L): AnyRef)).asJava)
    r.put("ending_snapshot_index", null)
    val got = roundTrip(r)
    assert(got.get("value_schema_id") === 17L)
    assert(got.get("partition_watermarks_high") === null)
    assert(got.get("partition_watermarks_low")
      .asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
        case (k2, v2) => k2.toString -> v2
      } === Map("0" -> 5L))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json, not}
import org.apache.spark.sql.types.StructType

import graft.streaming.CdcPipeline.{KeyedRecordSink, RecordProducer}

/** Binds [[LogBroker]] to the [[CdcPipeline.RecordProducer]] seam —
  * the A6 integration the reference implements over
  * `confluent_kafka.Producer` with `transactional.id` set
  * (`cdc_kafka/kafka.py:87-211`; txn-per-progress-commit loop
  * `cdc_kafka/main.py:319-350`).
  *
  * Exactly-once layering (G1/G2 restated for Structured Streaming):
  *
  *   - SOURCE half: the streaming checkpoint. A batch replays after a
  *     crash with the SAME batch id.
  *   - BROKER half: one transaction per (batch, task partition), with a
  *     `transactional.id` derived deterministically from those two — so a
  *     zombie task attempt that died mid-produce is FENCED when the retry
  *     calls `initTransactions` with the same id, and its dangling
  *     transaction is aborted before the retry writes. `read_committed`
  *     consumers therefore never observe the partial attempt.
  *   - KEYED half: records are keyed updates to a compacted topic, so a
  *     replay of an already-committed batch (checkpoint written but
  *     driver died before acknowledging) rewrites byte-identical records
  *     under new offsets and the COMPACTED view (A7) is unchanged — the
  *     same idempotence the reference leans on for its unified topics.
  *
  * The producer maps the seam onto the transactional API:
  * construction = `initTransactions` + `beginTransaction`;
  * `flush()` = `commitTransaction` (KeyedRecordSink calls it only after
  * every send of the partition succeeded); `close()` on the error path
  * (the sink's `finally`) aborts a still-open transaction, and is a
  * no-op after a successful commit.
  */
object BrokerSink {

  /** A [[RecordProducer]] bound to one LogBroker transaction.
    *
    * REPLAY SAFETY: if this (batch, partition)'s transactional id has
    * already COMMITTED — some sibling partitions of a failed batch may
    * have finished before the crash — the producer degrades to a no-op:
    * re-producing would double every record at the log level. This models
    * the reference's atomic data+progress commit (`kafka.py:87-101`): its
    * restart reads the progress that committed WITH the data and skips
    * completed work; here the broker's committed-transaction registry IS
    * that progress record. A real-Kafka adapter implements the same check
    * by committing a per-(batch, partition) marker to a control topic
    * inside the transaction and consulting it before replaying — and must
    * BOUND that consult: only markers within the replay horizon (the last
    * few batch ids a restart can legally re-attempt) are relevant, so the
    * control topic gets a retention/compaction policy and the restart
    * reads from the last checkpointed batch id minus that horizon, never
    * a from-beginning scan of an unbounded marker log. (The model
    * broker's in-memory registry grows per committed (batch, partition)
    * for its lifetime — fine for a test transport, wrong to replicate.)
    * The full adapter — this mapping spelled out over kafka-clients,
    * bounded marker consult included — is the `kafkaProducer` sbt
    * subproject (`contrib/kafka-producer/`), compiled in CI against the
    * clean-room `kafka-shim` facade (no kafka-clients jar exists in this
    * zero-egress environment) and contract-tested through mock clients
    * in `KafkaRecordProducerSpec`. */
  final class TxnRecordProducer(brokerName: String, transactionalId: String)
      extends RecordProducer {
    private val handle = {
      val h = LogBroker.get(brokerName)
        .initTransactionsUnlessCommitted(transactionalId)
      h.foreach(_.beginTransaction())
      h // None = already committed: every call below is a no-op
    }
    private var committed = false

    override def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
      handle.foreach(_.send(topic, key, value))

    /** Commit point: KeyedRecordSink flushes only on the success path. */
    override def flush(): Unit = {
      handle.foreach(_.commitTransaction())
      committed = true
    }

    /** Error-path cleanup: abort anything still open so a failed task
      * attempt leaves only invisible (aborted) records behind. Best
      * effort — if a newer epoch already fenced us, the broker has
      * aborted our transaction for us. */
    override def close(): Unit =
      if (!committed) {
        try handle.foreach(_.abortTransaction())
        catch { case _: RuntimeException => () }
      }
  }

  /** The transactional Kafka-shaped sink over an in-JVM [[LogBroker]].
    * `transactional.id` = `graft-<topic>-b<batchId>-p<partitionId>` —
    * stable across attempts, unique across (batch, partition). */
  def transactional(brokerName: String, topic: String): KeyedRecordSink =
    new KeyedRecordSink(
      (batchId, partitionId) => new TxnRecordProducer(
        brokerName, s"graft-$topic-b$batchId-p$partitionId"),
      topic)

  /** The CONSUMER half of A7: recover the current state table from the
    * broker's compacted view of `topic` — parse the sink's JSON values
    * back into rows (the reference's state-recovery consume,
    * `kafka.py:213-262` + last-wins fold `progress_tracking.py:235-258`;
    * compaction itself already applied the last-wins/tombstone fold).
    * The model broker's view is driver-side (it IS an in-JVM registry);
    * against a real broker this is a bounded `spark.read.format("kafka")`
    * plus the `a7` last-wins query — same downstream schema. */
  def compactedState(spark: SparkSession, brokerName: String,
      topic: String): DataFrame = {
    import spark.implicits._
    val values = LogBroker.get(brokerName).compactedView(topic)
      .map(r => new String(r.value, "UTF-8"))
    val schema = StructType.fromDDL(
      "userId LONG, lsnNum LONG, commandId INT, seqvalNum LONG, " +
        "operation INT, eventType STRING, value DOUBLE")
    val parsed = spark.createDataset(values)
      .select(col("value").as("raw"), from_json(col("value"), schema).as("j"))
    // Recovery must fail loudly, not resurrect NULL rows: from_json maps a
    // malformed document to an all-NULL struct, so a corrupt record would
    // otherwise silently survive as state with no key (ADVICE r5). The
    // required-field assertion costs one pass over an already-driver-side
    // compacted view.
    val corrupt = parsed
      .filter(col("j").isNull || col("j.userId").isNull).limit(1).collect()
    require(corrupt.isEmpty,
      s"corrupt record in compacted view of '$topic': " +
        corrupt.headOption.map(_.getString(0)).getOrElse(""))
    // Heartbeats are progress markers, not data (same rule as
    // CdcPipeline.compactedState): a heartbeat published through a
    // broker-backed KeyedRecordSink survives log compaction under its
    // pseudo-key, so without this filter recovery would resurrect a
    // phantom state row (userId=-1, eventType=__heartbeat) — ADVICE r6.
    parsed
      .filter(not(col("j.seqvalNum") === -1L && col("j.commandId") === 0 &&
        col("j.operation") === 4))
      .select(col("j.*"))
  }
}

package graft.streaming.kafka

import java.time.Duration
import java.util.Properties

import scala.jdk.CollectionConverters._

import org.apache.kafka.clients.consumer.{Consumer, KafkaConsumer}
import org.apache.kafka.clients.producer.{KafkaProducer, Producer, ProducerRecord}
import org.apache.kafka.common.TopicPartition
import org.apache.kafka.common.errors.ProducerFencedException
import org.apache.kafka.common.serialization.{ByteArrayDeserializer, ByteArraySerializer}

import graft.streaming.CdcPipeline.RecordProducer

/** Real-Kafka implementation of the [[graft.streaming.CdcPipeline.RecordProducer]]
  * seam — the wire-protocol twin of [[graft.streaming.BrokerSink.TxnRecordProducer]],
  * whose contract `LogBrokerSinkSpec` proves against the in-JVM model
  * (reference behavior: `cdc_kafka/kafka.py:87-211`, txn loop
  * `cdc_kafka/main.py:319-350`). Compiled against the clean-room
  * kafka-shim facade in CI (no kafka-clients jar ships in this
  * environment); `KafkaRecordProducerSpec` drives the full call
  * sequence through mock `Producer`/`Consumer` implementations.
  *
  * Exactly-once layering, mapped from the model:
  *
  *   - `transactional.id` = the (batchId, partitionId)-derived id the
  *     sink passes in — stable across task retries and post-crash batch
  *     replays, so `initTransactions()` FENCES any zombie attempt still
  *     holding the id (the broker bumps the epoch and aborts its dangling
  *     transaction) before this attempt writes.
  *   - COMMITTED-ID REPLAY SKIP (`LogBroker.initTransactionsUnlessCommitted`):
  *     Kafka does not remember which transactional ids committed, so the
  *     adapter persists its own marker — a record keyed by the txn id,
  *     sent to `controlTopic` INSIDE the transaction (atomic with the
  *     data). On construction the adapter reads the control topic
  *     BOUNDED to the replay horizon: seek to (end offset - horizon)
  *     per partition rather than from-beginning — the horizon only needs
  *     to cover the last few batch ids a restart can legally re-attempt,
  *     and an unbounded scan would grow with broker lifetime (the model
  *     broker's in-memory registry documents the same caveat). If the
  *     marker is present the producer degrades to a no-op, exactly like
  *     the model.
  *   - `flush()` here = send the marker + `commitTransaction()` — the
  *     sink calls it only after every send succeeded, making it the
  *     commit point.
  *   - `close()` on the error path aborts a still-open transaction
  *     (invisible to `read_committed` consumers); after a successful
  *     commit it only releases the client.
  *
  * Consumers of the published topics set `isolation.level=read_committed`
  * to get the visibility `LogBroker.readCommitted` models.
  *
  * @param clientProps extra client configuration merged into BOTH the
  *        producer and the consult consumer — the auth passthrough seam
  *        ([[KafkaOauth.saslOauthProps]] for AWS MSK OAUTHBEARER,
  *        reference `cdc_kafka/kafka_oauth/aws_msk.py`).
  * @param producerFactory / consumerFactory test seams; defaults build
  *        real clients. Factories receive the fully-assembled properties.
  */
final class KafkaRecordProducer(
    bootstrapServers: String,
    transactionalId: String,
    controlTopic: String = "graft-txn-markers",
    replayHorizonRecords: Long = 10000L,
    drainTimeout: Duration = Duration.ofSeconds(60),
    clientProps: Properties = new Properties(),
    producerFactory: Properties => Producer[Array[Byte], Array[Byte]] =
      KafkaRecordProducer.defaultProducerFactory,
    consumerFactory: Properties => Consumer[Array[Byte], Array[Byte]] =
      KafkaRecordProducer.defaultConsumerFactory) extends RecordProducer {

  private def baseProps: Properties = {
    val p = new Properties()
    p.put("bootstrap.servers", bootstrapServers)
    clientProps.stringPropertyNames().asScala
      .foreach(k => p.put(k, clientProps.getProperty(k)))
    p
  }

  /** Bounded control-topic consult: was this transactional id already
    * committed by a previous attempt of the same (batch, partition)?
    *
    * Drain rule (ADVICE r6): an EMPTY `poll()` is never terminal —
    * Kafka legally returns empty while a fetch is in flight, and
    * treating it as "drained" could miss the committed marker and
    * re-produce the batch, defeating exactly-once. The consult is done
    * only when every partition's `position()` reaches its end offset;
    * if that doesn't happen within `drainTimeout` the adapter FAILS
    * LOUDLY rather than guess — a retried task gets a fresh consult,
    * whereas a wrong `false` here would duplicate records at the log
    * level. */
  private def alreadyCommitted(): Boolean = {
    val p = baseProps
    p.put("isolation.level", "read_committed")
    p.put("enable.auto.commit", "false")
    // An OUT-OF-RANGE seek (retention/compaction already deleted the
    // offset `end - horizon` targets) must reset to the EARLIEST
    // retained offset and drain forward — the default `latest` would
    // jump the position straight to the end, satisfy the drain
    // condition without reading a record, and miss a committed marker
    // (re-producing the batch). Reading more than the horizon on that
    // path errs on the cheap side.
    p.put("auto.offset.reset", "earliest")
    val consumer = consumerFactory(p)
    try {
      // A null/empty partition listing means the control topic does not
      // exist yet — legitimately "nothing ever committed" on the very
      // first run. A transient metadata outage returns the same answer,
      // and concluding not-committed during an outage would rebuild the
      // producer and re-produce an already-committed batch — so the
      // listing is RETRIED a bounded number of times before the absence
      // is believed (ADVICE r7: same safe-by-default posture as the
      // drain timeout; first-run pays a few seconds once). Deployments
      // that cannot tolerate even the post-retry window pre-create the
      // control topic, making an empty listing unambiguous.
      var parts = consumer.partitionsFor(controlTopic)
      var retries = KafkaRecordProducer.MetadataRetries
      while ((parts == null || parts.isEmpty) && retries > 0) {
        Thread.sleep(KafkaRecordProducer.MetadataRetryBackoff.toMillis)
        parts = consumer.partitionsFor(controlTopic)
        retries -= 1
      }
      if (parts == null || parts.isEmpty) return false
      val tps = parts.asScala.map(i => new TopicPartition(controlTopic, i.partition())).toList
      consumer.assign(tps.asJava)
      val ends = consumer.endOffsets(tps.asJava).asScala
      tps.foreach { tp =>
        consumer.seek(tp, math.max(0L, ends(tp) - replayHorizonRecords))
      }
      val idBytes = transactionalId.getBytes("UTF-8")
      val deadline = System.nanoTime() + drainTimeout.toNanos
      var drained = false
      while (!drained) {
        val records = consumer.poll(Duration.ofSeconds(1))
        if (records.asScala.exists(r => java.util.Arrays.equals(r.key(), idBytes)))
          return true
        drained = tps.forall(tp => consumer.position(tp) >= ends(tp))
        if (!drained && System.nanoTime() > deadline)
          throw new IllegalStateException(
            s"timed out ($drainTimeout) draining control topic '$controlTopic' " +
              "for committed-transaction markers; failing the attempt rather " +
              "than risk re-producing a committed batch")
      }
      false
    } finally consumer.close()
  }

  private val producer: Option[Producer[Array[Byte], Array[Byte]]] =
    if (alreadyCommitted()) None // replay of a committed partition: no-op
    else {
      val p = baseProps
      p.put("transactional.id", transactionalId)
      p.put("enable.idempotence", "true")
      p.put("acks", "all")
      val kp = producerFactory(p)
      kp.initTransactions() // fences any zombie holding this id
      kp.beginTransaction()
      Some(kp)
    }

  /** Test seam: did the consult skip production entirely? */
  private[kafka] def isReplayNoOp: Boolean = producer.isEmpty

  private var committed = false

  override def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
    producer.foreach(_.send(new ProducerRecord(topic, key, value)))

  /** Commit point: marker rides inside the transaction, atomic with the
    * data — the restart's replay-skip signal. */
  override def flush(): Unit = {
    producer.foreach { kp =>
      kp.send(new ProducerRecord(controlTopic,
        transactionalId.getBytes("UTF-8"), Array.emptyByteArray))
      kp.commitTransaction()
    }
    committed = true
  }

  /** Error-path cleanup: abort anything still open; a fenced producer was
    * already aborted by the broker. */
  override def close(): Unit =
    producer.foreach { kp =>
      if (!committed) {
        try kp.abortTransaction()
        catch { case _: ProducerFencedException | _: IllegalStateException => () }
      }
      kp.close()
    }
}

object KafkaRecordProducer {
  /** Consult-time metadata retry budget: a null/empty `partitionsFor`
    * listing is re-asked this many times (with [[MetadataRetryBackoff]]
    * between) before "control topic absent" is believed — distinguishes
    * a genuinely missing topic from a transient metadata outage whose
    * misread would duplicate a committed batch. */
  private[kafka] val MetadataRetries = 5
  private[kafka] val MetadataRetryBackoff = Duration.ofMillis(200)

  /** Default client factories — the only lines that touch the concrete
    * kafka-clients entry points (shim at compile time, real jar at
    * runtime). */
  def defaultProducerFactory(p: Properties): Producer[Array[Byte], Array[Byte]] =
    new KafkaProducer[Array[Byte], Array[Byte]](
      p, new ByteArraySerializer, new ByteArraySerializer)

  def defaultConsumerFactory(p: Properties): Consumer[Array[Byte], Array[Byte]] =
    new KafkaConsumer[Array[Byte], Array[Byte]](
      p, new ByteArrayDeserializer, new ByteArrayDeserializer)
}

package graft.streaming.kafka

import java.time.Duration
import java.util.Properties

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.kafka.clients.consumer.{Consumer, ConsumerRecord, ConsumerRecords}
import org.apache.kafka.clients.producer.{Callback, Producer, ProducerRecord, RecordMetadata}
import org.apache.kafka.common.{Node, PartitionInfo, TopicPartition}
import org.apache.kafka.common.errors.ProducerFencedException
import org.scalatest.funsuite.AnyFunSuite

/** Contract test for the real-Kafka adapter: drives
  * [[KafkaRecordProducer]] through mock `Producer`/`Consumer`
  * implementations of the (shimmed) kafka-clients interfaces, asserting
  * the SAME call sequence `LogBrokerSinkSpec` proves against the in-JVM
  * broker model: consult → initTransactions → beginTransaction → send*
  * → marker-send → commitTransaction on success; abort on the error
  * path; full no-op on replay of a committed id. Plus the ADVICE r6
  * drain rule: an empty poll is never terminal. */
class KafkaRecordProducerSpec extends AnyFunSuite {

  private val Control = "graft-txn-markers"

  // ---- mocks --------------------------------------------------------

  final class RecordingProducer(
      failOn: Set[String] = Set.empty) extends Producer[Array[Byte], Array[Byte]] {
    val calls = mutable.Buffer[String]()
    val records = mutable.Buffer[(String, String)]() // (topic, key-as-utf8)
    private def hit(name: String): Unit = {
      calls += name
      if (failOn(name)) throw new ProducerFencedException(s"injected on $name")
    }
    override def initTransactions(): Unit = hit("initTransactions")
    override def beginTransaction(): Unit = hit("beginTransaction")
    override def commitTransaction(): Unit = hit("commitTransaction")
    override def abortTransaction(): Unit = hit("abortTransaction")
    override def send(r: ProducerRecord[Array[Byte], Array[Byte]])
        : java.util.concurrent.Future[RecordMetadata] = {
      calls += s"send:${r.topic()}"
      records += ((r.topic(), new String(r.key(), "UTF-8")))
      null
    }
    override def send(r: ProducerRecord[Array[Byte], Array[Byte]], cb: Callback)
        : java.util.concurrent.Future[RecordMetadata] = send(r)
    override def flush(): Unit = hit("flush")
    override def partitionsFor(t: String): java.util.List[PartitionInfo] =
      java.util.Collections.emptyList()
    override def close(): Unit = hit("close")
    override def close(timeout: Duration): Unit = hit("close")
  }

  /** Control-topic consumer with one partition and a scripted poll
    * sequence; each step yields (records, position-after-poll). */
  class ScriptedConsumer(
      endOffset: Long,
      script: Seq[(Seq[(String, Array[Byte])], Long)]) // (key→value records, pos after)
      extends Consumer[Array[Byte], Array[Byte]] {
    val calls = mutable.Buffer[String]()
    var closed = false
    private var step = 0
    private var pos = 0L
    private def tp(t: String) = new TopicPartition(t, 0)
    override def partitionsFor(t: String): java.util.List[PartitionInfo] =
      java.util.List.of(new PartitionInfo(t, 0, Node.noNode(),
        Array.empty[Node], Array.empty[Node]))
    override def assign(ps: java.util.Collection[TopicPartition]): Unit =
      calls += s"assign:${ps.size()}"
    override def endOffsets(ps: java.util.Collection[TopicPartition])
        : java.util.Map[TopicPartition, java.lang.Long] =
      ps.asScala.map(p => p -> java.lang.Long.valueOf(endOffset)).toMap.asJava
    override def seek(p: TopicPartition, offset: Long): Unit = {
      calls += s"seek:$offset"; pos = offset
    }
    override def position(p: TopicPartition): Long = pos
    override def poll(timeout: Duration): ConsumerRecords[Array[Byte], Array[Byte]] = {
      calls += "poll"
      val (recs, newPos) =
        if (step < script.size) script(step) else (Seq.empty, pos)
      step += 1
      pos = newPos
      val list = recs.zipWithIndex.map { case ((k, v), i) =>
        new ConsumerRecord[Array[Byte], Array[Byte]](
          Control, 0, pos - recs.size + i, k.getBytes("UTF-8"), v)
      }.asJava
      new ConsumerRecords(java.util.Map.of(tp(Control), list))
    }
    override def close(): Unit = { closed = true; calls += "close" }
  }

  private def emptyConsult = new ScriptedConsumer(0L, Seq((Seq.empty, 0L)))

  private def adapter(txnId: String,
      consumer: ScriptedConsumer,
      producer: RecordingProducer,
      drainTimeout: Duration = Duration.ofSeconds(60),
      horizon: Long = 10000L,
      props: Properties = new Properties(),
      producerProps: Properties => Unit = _ => ()) =
    new KafkaRecordProducer("broker:9092", txnId,
      controlTopic = Control, replayHorizonRecords = horizon,
      drainTimeout = drainTimeout, clientProps = props,
      producerFactory = p => { producerProps(p); producer },
      consumerFactory = _ => consumer)

  // ---- the LogBrokerSinkSpec sequence, over kafka-clients ----------

  test("success path: init → begin → send* → marker → commit; close releases without abort") {
    val prod = new RecordingProducer
    val cons = emptyConsult
    val a = adapter("tx-ok", cons, prod)
    a.send("events", "k1".getBytes, "v1".getBytes)
    a.send("events", "k2".getBytes, "v2".getBytes)
    a.flush()
    a.close()
    assert(prod.calls.toSeq === Seq(
      "initTransactions", "beginTransaction",
      "send:events", "send:events",
      s"send:$Control", // the committed-id marker, INSIDE the txn
      "commitTransaction", "close"))
    // Marker keyed by the transactional id, atomic with the data.
    assert(prod.records.last === ((Control, "tx-ok")))
    assert(cons.closed, "consult consumer must be released")
  }

  test("error path (no flush): close aborts the open transaction") {
    val prod = new RecordingProducer
    val a = adapter("tx-err", emptyConsult, prod)
    a.send("events", "k".getBytes, "v".getBytes)
    a.close() // sink's finally without a flush = failed attempt
    assert(prod.calls.toSeq === Seq(
      "initTransactions", "beginTransaction", "send:events",
      "abortTransaction", "close"))
  }

  test("abort racing a newer epoch: ProducerFenced on abort is swallowed, close still runs") {
    val prod = new RecordingProducer(failOn = Set("abortTransaction"))
    val a = adapter("tx-fenced", emptyConsult, prod)
    a.send("events", "k".getBytes, "v".getBytes)
    a.close() // the broker already aborted for us: must not throw
    assert(prod.calls.takeRight(2).toSeq === Seq("abortTransaction", "close"))
  }

  test("replay of a committed id: consult finds the marker, production degrades to a no-op") {
    val marker = Seq(("tx-done", Array.emptyByteArray))
    val cons = new ScriptedConsumer(3L, Seq((marker, 3L)))
    var producerBuilt = false
    val a = new KafkaRecordProducer("broker:9092", "tx-done",
      controlTopic = Control,
      producerFactory = _ => { producerBuilt = true; new RecordingProducer },
      consumerFactory = _ => cons)
    assert(a.isReplayNoOp)
    assert(!producerBuilt, "a committed id must never build a producer")
    a.send("events", "k".getBytes, "v".getBytes) // all no-ops
    a.flush()
    a.close()
  }

  test("consult seeks to end - horizon, never from-beginning") {
    val cons = new ScriptedConsumer(100000L, Seq((Seq.empty, 100000L)))
    val prod = new RecordingProducer
    adapter("tx-h", cons, prod, horizon = 10000L)
    assert(cons.calls.contains("seek:90000"),
      s"expected bounded seek, got ${cons.calls}")
    // Small topics clamp to 0, not negative.
    val cons2 = new ScriptedConsumer(5L, Seq((Seq.empty, 5L)))
    adapter("tx-h2", cons2, new RecordingProducer, horizon = 10000L)
    assert(cons2.calls.contains("seek:0"))
  }

  test("ADVICE r6 drain rule: an empty poll mid-fetch is NOT terminal — the marker after it is found") {
    // End offset 5; first poll returns empty WITHOUT reaching the end
    // (fetch in flight), second poll carries the marker. The pre-fix
    // adapter treated the first empty poll as fully drained and would
    // have re-produced the batch.
    val cons = new ScriptedConsumer(5L, Seq(
      (Seq.empty, 0L), // in-flight fetch: empty, position unmoved
      (Seq(("tx-slow", Array.emptyByteArray)), 5L)))
    val a = new KafkaRecordProducer("broker:9092", "tx-slow",
      controlTopic = Control,
      producerFactory = _ => fail("must not produce: the id committed"),
      consumerFactory = _ => cons)
    assert(a.isReplayNoOp)
  }

  test("positions reaching end offsets without the marker completes the consult as not-committed") {
    val cons = new ScriptedConsumer(5L, Seq(
      (Seq.empty, 0L),
      (Seq(("some-other-id", Array.emptyByteArray)), 3L),
      (Seq.empty, 5L))) // reaches end: drained, marker absent
    val prod = new RecordingProducer
    val a = adapter("tx-fresh", cons, prod)
    assert(!a.isReplayNoOp)
    assert(cons.calls.count(_ == "poll") === 3)
  }

  test("ADVICE r7: a transient null metadata listing is retried — the marker behind it is found") {
    // partitionsFor returns null twice (metadata outage), then the real
    // listing whose drain carries the committed marker. The pre-fix
    // consult concluded not-committed on the first null and re-produced
    // the batch.
    val cons = new ScriptedConsumer(3L,
      Seq((Seq(("tx-outage", Array.emptyByteArray)), 3L))) {
      private var listCalls = 0
      override def partitionsFor(t: String): java.util.List[PartitionInfo] = {
        listCalls += 1
        if (listCalls <= 2) null else super.partitionsFor(t)
      }
    }
    val a = new KafkaRecordProducer("broker:9092", "tx-outage",
      controlTopic = Control,
      producerFactory = _ => fail("must not produce: the id committed"),
      consumerFactory = _ => cons)
    assert(a.isReplayNoOp)
  }

  test("a listing still empty after the retry budget means first run: producer is built") {
    val cons = new ScriptedConsumer(0L, Seq.empty) {
      var listCalls = 0
      override def partitionsFor(t: String): java.util.List[PartitionInfo] = {
        listCalls += 1; java.util.Collections.emptyList()
      }
    }
    val prod = new RecordingProducer
    val a = adapter("tx-first-run", cons, prod)
    assert(!a.isReplayNoOp)
    assert(cons.listCalls === 1 + KafkaRecordProducer.MetadataRetries,
      "absence must only be believed after the bounded retries")
  }

  test("a consult that cannot drain fails loudly instead of guessing not-committed") {
    // Positions never reach the end offset and no marker arrives: the
    // only safe outcome is failing the attempt (a wrong `false` would
    // double-produce a committed batch).
    val cons = new ScriptedConsumer(5L, Seq((Seq.empty, 0L)))
    val ex = intercept[IllegalStateException] {
      adapter("tx-stuck", cons, new RecordingProducer,
        drainTimeout = Duration.ofMillis(1))
    }
    assert(ex.getMessage.contains("draining control topic"))
    assert(cons.closed, "consumer must be released on the failure path too")
  }

  test("clientProps (the auth passthrough) reach both producer and consumer factories") {
    val props = KafkaOauth.saslOauthProps("example.MskLoginHandler")
    var producerSeen: Properties = null
    var consumerSeen: Properties = null
    val a = new KafkaRecordProducer("broker:9092", "tx-auth",
      controlTopic = Control, clientProps = props,
      producerFactory = p => { producerSeen = p; new RecordingProducer },
      consumerFactory = p => { consumerSeen = p; emptyConsult })
    a.flush(); a.close()
    // The control-topic consult authenticates like the producer does...
    assert(consumerSeen.getProperty("sasl.mechanism") === "OAUTHBEARER")
    assert(consumerSeen.getProperty("isolation.level") === "read_committed")
    // ...and the producer carries auth + transactional identity.
    assert(producerSeen.getProperty("sasl.mechanism") === "OAUTHBEARER")
    assert(producerSeen.getProperty("security.protocol") === "SASL_SSL")
    assert(producerSeen.getProperty("transactional.id") === "tx-auth")
    assert(producerSeen.getProperty("enable.idempotence") === "true")
    assert(producerSeen.getProperty("bootstrap.servers") === "broker:9092")
  }
}

package graft.streaming.kafka

import java.time.Duration
import java.util.Properties

/** Env-gated REAL-broker exercise of [[KafkaRecordProducer]] — the one
  * runway the sandbox cannot taxi (no kafka-clients jar, no broker): a
  * production user drops the real `kafka-clients` jar on the classpath
  * in place of the compile-only shim, points
  * `SPARK_GRAFT_KAFKA_BOOTSTRAP` at a broker, and this main drives the
  * adapter's full exactly-once ladder against it:
  *
  *   1. produce a batch under a fresh transactional id and commit
  *      (marker inside the transaction);
  *   2. REPLAY the same id — the control-topic consult must degrade the
  *      producer to a no-op (the crash-between-commit-and-checkpoint
  *      case `LogBrokerSinkSpec`/`KafkaRecordProducerBrokerSpec` prove
  *      against the in-JVM model);
  *   3. abort path — an uncommitted producer's close must abort, and a
  *      `read_committed` consumer of the data topic must see exactly
  *      the step-1 records.
  *
  * Run: `SPARK_GRAFT_KAFKA_BOOTSTRAP=broker:9092 \
  *       java -cp <app+kafka-clients jars> graft.streaming.kafka.RealBrokerCheck`
  * Optional: `SPARK_GRAFT_KAFKA_TOPIC` (default `graft-real-check`; the
  * topic AND the control topic `graft-txn-markers` must exist or broker
  * auto-create must be on).
  *
  * Exit 0 = all three gates held; nonzero prints which gate failed.
  * Without the env var the main explains itself and exits 0 (so CI that
  * happens to invoke it is a no-op, like the env-gated stress suite). */
object RealBrokerCheck {

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP") match {
      case None =>
        println("[real-broker-check] SPARK_GRAFT_KAFKA_BOOTSTRAP not set; " +
          "nothing to do (set it to run the adapter against a real broker " +
          "with the real kafka-clients jar on the classpath)")
      case Some(bootstrap) => run(bootstrap)
    }
  }

  private def run(bootstrap: String): Unit = {
    val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "graft-real-check")
    val txnId = s"graft-real-check-${System.currentTimeMillis()}"
    val payload = (1 to 10).map(i => (s"k$i", s"v$i-$txnId"))

    // Gate 1: produce + commit.
    val p1 = new KafkaRecordProducer(bootstrap, txnId)
    payload.foreach { case (k, v) =>
      p1.send(topic, k.getBytes("UTF-8"), v.getBytes("UTF-8"))
    }
    p1.flush()
    p1.close()
    require(!p1.isReplayNoOp, "fresh id must have produced")
    println(s"[real-broker-check] gate 1 OK: committed ${payload.size} records under $txnId")

    // Gate 2: replay of the committed id is a no-op.
    val p2 = new KafkaRecordProducer(bootstrap, txnId)
    payload.foreach { case (k, v) =>
      p2.send(topic, k.getBytes("UTF-8"), v.getBytes("UTF-8"))
    }
    p2.flush()
    p2.close()
    require(p2.isReplayNoOp,
      "replay of a committed transactional id must consult the control " +
        "topic and produce nothing")
    println("[real-broker-check] gate 2 OK: committed-id replay was a no-op")

    // Gate 3: an ABORTED attempt is invisible to read_committed readers —
    // count this run's records on the data topic; only gate 1's commit
    // may be visible.
    val p3 = new KafkaRecordProducer(bootstrap, s"$txnId-aborted")
    p3.send(topic, "kx".getBytes("UTF-8"), s"vx-$txnId".getBytes("UTF-8"))
    p3.close() // close without flush = abort
    val props = new Properties()
    props.put("bootstrap.servers", bootstrap)
    props.put("isolation.level", "read_committed")
    props.put("enable.auto.commit", "false")
    props.put("group.id", s"$txnId-verify")
    props.put("auto.offset.reset", "earliest")
    val consumer = KafkaRecordProducer.defaultConsumerFactory(props)
    try {
      import scala.jdk.CollectionConverters._
      val parts = consumer.partitionsFor(topic).asScala
        .map(i => new org.apache.kafka.common.TopicPartition(topic, i.partition()))
      consumer.assign(parts.asJava)
      val deadline = System.nanoTime() + Duration.ofSeconds(30).toNanos
      var mine = Vector.empty[String]
      var drained = false
      val ends = consumer.endOffsets(parts.asJava).asScala
      while (!drained && System.nanoTime() < deadline) {
        val records = consumer.poll(Duration.ofSeconds(1))
        mine ++= records.asScala
          .map(r => new String(r.value(), "UTF-8"))
          .filter(_.endsWith(txnId))
        drained = parts.forall(tp => consumer.position(tp) >= ends(tp))
      }
      require(mine.sorted == payload.map(_._2).sorted.toVector,
        s"read_committed must see exactly gate 1's records; got ${mine.size}")
      println("[real-broker-check] gate 3 OK: aborted attempt invisible, " +
        s"committed batch intact (${mine.size} records)")
    } finally consumer.close()
    println("[real-broker-check] PASS: all three exactly-once gates held")
  }
}

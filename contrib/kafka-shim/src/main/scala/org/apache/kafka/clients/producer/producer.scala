// Compile-only shim — see ../../common/common.scala for the contract.
package org.apache.kafka.clients.producer

import java.time.Duration
import java.util.Properties
import java.util.concurrent.Future

import org.apache.kafka.common.PartitionInfo
import org.apache.kafka.common.serialization.Serializer

/** Mirror of `org.apache.kafka.clients.producer.ProducerRecord`. */
final class ProducerRecord[K, V](
    t: String, p: java.lang.Integer, k: K, v: V) {
  def this(topic: String, key: K, value: V) = this(topic, null, key, value)
  def this(topic: String, value: V) = this(topic, null, null.asInstanceOf[K], value)
  def topic(): String = t
  def partition(): java.lang.Integer = p
  def key(): K = k
  def value(): V = v
}

/** Mirror of `org.apache.kafka.clients.producer.RecordMetadata`
  * (identity fields only — the adapter never reads one). */
final class RecordMetadata(t: String, p: Int, o: Long) {
  def topic(): String = t
  def partition(): Int = p
  def offset(): Long = o
}

/** Mirror of `org.apache.kafka.clients.producer.Callback`. */
trait Callback {
  def onCompletion(metadata: RecordMetadata, exception: Exception): Unit
}

/** Mirror of `org.apache.kafka.clients.producer.Producer` — the subset
  * the adapter uses (transactional API + send/flush/close). Mocks in
  * the contract test implement THIS interface, exactly as application
  * code against real kafka-clients would mock it. */
trait Producer[K, V] extends java.io.Closeable {
  def initTransactions(): Unit
  def beginTransaction(): Unit
  def commitTransaction(): Unit
  def abortTransaction(): Unit
  def send(record: ProducerRecord[K, V]): Future[RecordMetadata]
  def send(record: ProducerRecord[K, V], callback: Callback): Future[RecordMetadata]
  def flush(): Unit
  def partitionsFor(topic: String): java.util.List[PartitionInfo]
  def close(): Unit
  def close(timeout: Duration): Unit
}

/** Mirror of `org.apache.kafka.clients.producer.KafkaProducer`.
  * CONSTRUCTION THROWS: the shim is compile-only; a runtime classpath
  * must carry the real kafka-clients jar instead of this one. */
class KafkaProducer[K, V](
    properties: Properties,
    keySerializer: Serializer[K],
    valueSerializer: Serializer[V]) extends Producer[K, V] {
  def this(properties: Properties) = this(properties, null, null)

  throw new UnsupportedOperationException(
    "org.apache.kafka shim: compile-time facade only — put the real " +
      "kafka-clients jar (and not the shim) on the runtime classpath")

  override def initTransactions(): Unit = ()
  override def beginTransaction(): Unit = ()
  override def commitTransaction(): Unit = ()
  override def abortTransaction(): Unit = ()
  override def send(record: ProducerRecord[K, V]): Future[RecordMetadata] = null
  override def send(record: ProducerRecord[K, V], callback: Callback): Future[RecordMetadata] = null
  override def flush(): Unit = ()
  override def partitionsFor(topic: String): java.util.List[PartitionInfo] = null
  override def close(): Unit = ()
  override def close(timeout: Duration): Unit = ()
}

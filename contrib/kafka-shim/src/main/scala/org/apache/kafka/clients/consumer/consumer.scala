// Compile-only shim — see ../../common/common.scala for the contract.
package org.apache.kafka.clients.consumer

import java.time.Duration
import java.util.Properties

import org.apache.kafka.common.{PartitionInfo, TopicPartition}
import org.apache.kafka.common.serialization.Deserializer

/** Mirror of `org.apache.kafka.clients.consumer.ConsumerRecord`
  * (identity + payload fields only). */
final class ConsumerRecord[K, V](
    t: String, p: Int, o: Long, k: K, v: V) {
  def topic(): String = t
  def partition(): Int = p
  def offset(): Long = o
  def key(): K = k
  def value(): V = v
}

/** Mirror of `org.apache.kafka.clients.consumer.ConsumerRecords`. */
final class ConsumerRecords[K, V](
    records: java.util.Map[TopicPartition, java.util.List[ConsumerRecord[K, V]]])
    extends java.lang.Iterable[ConsumerRecord[K, V]] {
  def isEmpty: Boolean = count() == 0
  def count(): Int = {
    var n = 0
    val it = records.values().iterator()
    while (it.hasNext) n += it.next().size()
    n
  }
  override def iterator(): java.util.Iterator[ConsumerRecord[K, V]] = {
    val all = new java.util.ArrayList[ConsumerRecord[K, V]]()
    records.values().forEach(l => all.addAll(l))
    all.iterator()
  }
}

object ConsumerRecords {
  def empty[K, V](): ConsumerRecords[K, V] =
    new ConsumerRecords(java.util.Collections.emptyMap())
}

/** Mirror of `org.apache.kafka.clients.consumer.Consumer` — the subset
  * the adapter's bounded control-topic consult uses. */
trait Consumer[K, V] extends java.io.Closeable {
  def assign(partitions: java.util.Collection[TopicPartition]): Unit
  def partitionsFor(topic: String): java.util.List[PartitionInfo]
  def endOffsets(partitions: java.util.Collection[TopicPartition]): java.util.Map[TopicPartition, java.lang.Long]
  def seek(partition: TopicPartition, offset: Long): Unit
  def position(partition: TopicPartition): Long
  def poll(timeout: Duration): ConsumerRecords[K, V]
  def close(): Unit
}

/** Mirror of `org.apache.kafka.clients.consumer.KafkaConsumer`.
  * CONSTRUCTION THROWS: the shim is compile-only; a runtime classpath
  * must carry the real kafka-clients jar instead of this one. */
class KafkaConsumer[K, V](
    properties: Properties,
    keyDeserializer: Deserializer[K],
    valueDeserializer: Deserializer[V]) extends Consumer[K, V] {
  def this(properties: Properties) = this(properties, null, null)

  throw new UnsupportedOperationException(
    "org.apache.kafka shim: compile-time facade only — put the real " +
      "kafka-clients jar (and not the shim) on the runtime classpath")

  override def assign(partitions: java.util.Collection[TopicPartition]): Unit = ()
  override def partitionsFor(topic: String): java.util.List[PartitionInfo] = null
  override def endOffsets(partitions: java.util.Collection[TopicPartition]): java.util.Map[TopicPartition, java.lang.Long] = null
  override def seek(partition: TopicPartition, offset: Long): Unit = ()
  override def position(partition: TopicPartition): Long = 0L
  override def poll(timeout: Duration): ConsumerRecords[K, V] = null
  override def close(): Unit = ()
}

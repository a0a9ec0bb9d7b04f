// COMPILE-ONLY SHIM of the public Apache Kafka client API (the subset
// graft's adapter uses). No kafka-clients jar exists in this zero-egress
// build environment, so these declarations stand in for the real classes
// at COMPILE TIME ONLY: signatures mirror the published kafka-clients 3.x
// public API (clean-room, from the public Javadoc — no Kafka source was
// copied), letting `contrib/kafka-producer` type-check in CI so type
// drift cannot rot it (VERDICT r6 #1).
//
// Deployment rule: this shim jar must NEVER reach a runtime classpath.
// A real deployment ships graft-kafka-producer.jar next to the real
// kafka-clients jar, which provides these exact classes; the shim's
// entry-point classes (KafkaProducer/KafkaConsumer) throw on
// construction as a guard against accidental runtime use. Value-object
// classes (TopicPartition, ProducerRecord, ConsumerRecord...) are real
// minimal implementations so contract tests can drive mocks through the
// interfaces.
package org.apache.kafka.common

/** Mirror of `org.apache.kafka.common.TopicPartition`. */
final class TopicPartition(t: String, p: Int) {
  def topic(): String = t
  def partition(): Int = p
  override def equals(o: Any): Boolean = o match {
    case other: TopicPartition => other.topic() == t && other.partition() == p
    case _ => false
  }
  override def hashCode(): Int = 31 * (31 + p) + t.hashCode
  override def toString: String = s"$t-$p"
}

/** Mirror of `org.apache.kafka.common.Node` (identity fields only). */
final class Node(id: Int, host: String, port: Int) {
  def idNum: Int = id
  override def toString: String = s"$host:$port (id: $id)"
}

object Node {
  def noNode(): Node = new Node(-1, "", -1)
}

/** Mirror of `org.apache.kafka.common.PartitionInfo`. */
final class PartitionInfo(
    t: String, p: Int, leader: Node, replicas: Array[Node],
    inSyncReplicas: Array[Node]) {
  def topic(): String = t
  def partition(): Int = p
}

/** Mirror of `org.apache.kafka.common.KafkaException`. */
class KafkaException(message: String, cause: Throwable)
    extends RuntimeException(message, cause) {
  def this(message: String) = this(message, null)
  def this() = this(null, null)
}

// Compile-only shim — see ../common.scala for the contract.
package org.apache.kafka.common.serialization

/** Mirror of `org.apache.kafka.common.serialization.Serializer`. */
trait Serializer[T] extends java.io.Closeable {
  def configure(configs: java.util.Map[String, _], isKey: Boolean): Unit = ()
  def serialize(topic: String, data: T): Array[Byte]
  override def close(): Unit = ()
}

/** Mirror of `org.apache.kafka.common.serialization.Deserializer`. */
trait Deserializer[T] extends java.io.Closeable {
  def configure(configs: java.util.Map[String, _], isKey: Boolean): Unit = ()
  def deserialize(topic: String, data: Array[Byte]): T
  override def close(): Unit = ()
}

/** Mirror of `ByteArraySerializer`: the identity serialization. */
final class ByteArraySerializer extends Serializer[Array[Byte]] {
  override def serialize(topic: String, data: Array[Byte]): Array[Byte] = data
}

/** Mirror of `ByteArrayDeserializer`: the identity deserialization. */
final class ByteArrayDeserializer extends Deserializer[Array[Byte]] {
  override def deserialize(topic: String, data: Array[Byte]): Array[Byte] = data
}

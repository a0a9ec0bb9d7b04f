package graft.serde

import scala.collection.mutable

import org.apache.avro.{Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType

/** Confluent-style subject registry (SURVEY §2 F4; reference
  * `serializers/avro.py:632-664`): schemas register under a per-topic
  * subject (`<topic>-key` / `<topic>-value`), registration is idempotent
  * (the same schema gets the same id back), and an evolution must pass
  * the FORWARD compatibility gate the reference registers with — data
  * written with the NEW schema must remain readable by consumers still
  * holding the PREVIOUS one. Ids are what the Confluent frame carries
  * (magic 0x00 + id + body, [[AvroSerde]]).
  */
trait SchemaRegistryClient {
  /** Register (or find) `schema` under `subject`; returns its id.
    * Throws [[IncompatibleSchemaException]] when the subject's latest
    * schema cannot read data written with the candidate. */
  def register(subject: String, schema: Schema): Int
  def byId(id: Int): Option[Schema]
  def latest(subject: String): Option[(Int, Schema)]
}

final class IncompatibleSchemaException(msg: String) extends RuntimeException(msg)

/** In-process registry: the test/local stand-in for a Confluent Schema
  * Registry (an HTTP adapter speaks the same subject/id contract against
  * `POST /subjects/<s>/versions`; no registry service ships in this
  * environment). Thread-safe; ids are global like Confluent's. */
final class InMemorySchemaRegistry extends SchemaRegistryClient {

  private val lock = new Object
  private val byIdMap = mutable.Map[Int, Schema]()
  private val bySubject = mutable.Map[String, mutable.ArrayBuffer[(Int, Schema)]]()
  private var nextId = 1

  override def register(subject: String, schema: Schema): Int = lock.synchronized {
    val versions = bySubject.getOrElseUpdate(subject, mutable.ArrayBuffer.empty)
    versions.find(_._2 == schema) match {
      case Some((id, _)) => id
      case None =>
        versions.lastOption.foreach { case (_, prev) =>
          // FORWARD: the previous schema (reader) must understand data
          // produced with the candidate (writer).
          val result = SchemaCompatibility
            .checkReaderWriterCompatibility(prev, schema)
            .getType
          if (result != SchemaCompatibilityType.COMPATIBLE)
            throw new IncompatibleSchemaException(
              s"schema for subject '$subject' breaks FORWARD compatibility " +
                s"with the latest registered version")
        }
        val id = nextId
        nextId += 1
        byIdMap(id) = schema
        versions += ((id, schema))
        id
    }
  }

  override def byId(id: Int): Option[Schema] = lock.synchronized(byIdMap.get(id))

  override def latest(subject: String): Option[(Int, Schema)] =
    lock.synchronized(bySubject.get(subject).flatMap(_.lastOption))
}

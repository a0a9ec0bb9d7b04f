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

/** Confluent compatibility LEVELS (the registry-side evolution policy a
  * deployment sets per subject with `PUT /config/<subject>`): which
  * (reader, writer) directions a candidate schema must satisfy against
  * the subject's latest version. */
object CompatibilityLevel extends Enumeration {
  /** New schema must READ data written by the previous (consumers
    * upgrade first). Confluent's default. */
  val Backward = Value("BACKWARD")
  /** Previous schema must read data WRITTEN by the new one (producers
    * upgrade first — the reference's registration mode,
    * `serializers/avro.py:270-343`). */
  val Forward = Value("FORWARD")
  /** Both directions. */
  val Full = Value("FULL")
  /** Gate disabled. */
  val None_ = Value("NONE")
}

final class IncompatibleSchemaException(msg: String) extends RuntimeException(msg)

/** In-process registry: the test/local stand-in for a Confluent Schema
  * Registry (an HTTP adapter speaks the same subject/id contract against
  * `POST /subjects/<s>/versions`; no registry service ships in this
  * environment). Thread-safe; ids are global like Confluent's. */
final class InMemorySchemaRegistry(
    defaultLevel: CompatibilityLevel.Value = CompatibilityLevel.Forward)
  extends SchemaRegistryClient {

  private val lock = new Object
  private val byIdMap = mutable.Map[Int, Schema]()
  private val bySubject = mutable.Map[String, mutable.ArrayBuffer[(Int, Schema)]]()
  private val levels = mutable.Map[String, CompatibilityLevel.Value]()
  private var nextId = 1

  /** Per-subject compatibility level (Confluent `PUT /config/<subject>`).
    * Applies to FUTURE registrations only, like the real service. */
  def setCompatibility(subject: String, level: CompatibilityLevel.Value): Unit =
    lock.synchronized { levels(subject) = level }

  def compatibility(subject: String): CompatibilityLevel.Value =
    lock.synchronized(levels.getOrElse(subject, defaultLevel))

  private def canRead(reader: Schema, writer: Schema): Boolean =
    SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
      .getType == SchemaCompatibilityType.COMPATIBLE

  override def register(subject: String, schema: Schema): Int = lock.synchronized {
    val versions = bySubject.getOrElseUpdate(subject, mutable.ArrayBuffer.empty)
    versions.find(_._2 == schema) match {
      case Some((id, _)) => id
      case None =>
        versions.lastOption.foreach { case (_, prev) =>
          import CompatibilityLevel._
          val level = compatibility(subject)
          // BACKWARD: the candidate (reader) must read data written with
          // the previous schema. FORWARD: the previous schema (reader)
          // must read data written with the candidate. FULL: both.
          val ok = level match {
            case Backward => canRead(schema, prev)
            case Forward => canRead(prev, schema)
            case Full => canRead(schema, prev) && canRead(prev, schema)
            case None_ => true
          }
          if (!ok)
            throw new IncompatibleSchemaException(
              s"schema for subject '$subject' breaks $level compatibility " +
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

package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.{Schema, SchemaBuilder}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.serde.{AvroSerde, HttpSchemaRegistry, IncompatibleSchemaException,
  InMemorySchemaRegistry}

/** The HTTP registry client against a mock Confluent Schema Registry
  * (JDK HttpServer): the wire contract (`POST /subjects/<s>/versions`,
  * `GET /schemas/ids/<id>`, `GET .../versions/latest`, 409 on
  * incompatibility, 404 on absence), the id cache (ids are immutable —
  * one fetch per id ever), bounded retry on 5xx, and drop-in
  * equivalence with the in-memory registry through the AvroSerde
  * encoder path. The mock DELEGATES semantics to InMemorySchemaRegistry
  * so both implementations are proven against the same behavior. */
class HttpSchemaRegistrySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val backing = new InMemorySchemaRegistry
  private val requests = mutable.Buffer[String]()
  @volatile private var failNext = 0 // respond 500 to this many requests

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def quote(s: String) = graft.serde.MicroJson.quote(s)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      requests += s"${ex.getRequestMethod} $path"
      if (failNext > 0) { failNext -= 1; respond(ex, 500, "boom") }
      else {
        val SubjectVersions = "/subjects/([^/]+)/versions".r
        val SchemaById = "/schemas/ids/([0-9]+)".r
        val Latest = "/subjects/([^/]+)/versions/latest".r
        val Config = "/config/([^/]+)".r
        (ex.getRequestMethod, path) match {
          case ("PUT", Config(subject)) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            graft.serde.MicroJson.stringField(body, "compatibility")
              .flatMap(l => scala.util.Try(
                graft.serde.CompatibilityLevel.withName(l)).toOption) match {
              case Some(level) =>
                backing.setCompatibility(subject, level)
                respond(ex, 200, s"""{"compatibility":"$level"}""")
              case None => respond(ex, 422, """{"error_code":42203}""")
            }
          case ("POST", SubjectVersions(subject)) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            graft.serde.MicroJson.stringField(body, "schema") match {
              case None => respond(ex, 422, """{"error_code":42201}""")
              case Some(schemaJson) =>
                try {
                  val id = backing.register(subject, new Schema.Parser().parse(schemaJson))
                  respond(ex, 200, s"""{"id":$id}""")
                } catch {
                  case _: IncompatibleSchemaException =>
                    respond(ex, 409, """{"error_code":409,"message":"incompatible"}""")
                }
            }
          case ("GET", Latest(subject)) =>
            backing.latest(subject) match {
              case Some((id, s)) => respond(ex, 200,
                s"""{"subject":${quote(subject)},"version":1,"id":$id,"schema":${quote(s.toString)}}""")
              case None => respond(ex, 404, """{"error_code":40401}""")
            }
          case ("GET", SchemaById(id)) =>
            backing.byId(id.toInt) match {
              case Some(s) => respond(ex, 200, s"""{"schema":${quote(s.toString)}}""")
              case None => respond(ex, 404, """{"error_code":40403}""")
            }
          case _ => respond(ex, 404, """{"error_code":404}""")
        }
      }
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def schemaV1: Schema = SchemaBuilder.record("E").namespace("graft")
    .fields().requiredLong("id").requiredString("name").endRecord()
  // FORWARD-compatible evolution: adds a field with a default.
  private def schemaV2: Schema = SchemaBuilder.record("E").namespace("graft")
    .fields().requiredLong("id").requiredString("name")
    .name("extra").`type`().stringType().stringDefault("").endRecord()
  // Breaking: re-types an existing field.
  private def schemaBad: Schema = SchemaBuilder.record("E").namespace("graft")
    .fields().requiredString("id").requiredString("name").endRecord()

  test("register is idempotent, evolution passes the gate, incompatible gets 409 -> exception") {
    val reg = new HttpSchemaRegistry(base)
    val id1 = reg.register("t1-value", schemaV1)
    assert(reg.register("t1-value", schemaV1) === id1, "re-register must return the same id")
    val id2 = reg.register("t1-value", schemaV2)
    assert(id2 !== id1)
    val ex = intercept[IncompatibleSchemaException] {
      reg.register("t1-value", schemaBad)
    }
    assert(ex.getMessage.contains("409"))
    assert(reg.latest("t1-value").map(_._1) === Some(id2))
  }

  test("byId resolves, caches (one HTTP fetch per id ever), and returns None on 404") {
    val reg = new HttpSchemaRegistry(base)
    val id = reg.register("t2-value", schemaV1)
    requests.clear()
    assert(reg.byId(id).map(_.getName) === Some("E"))
    assert(reg.byId(id).map(_.getName) === Some("E"))
    assert(reg.byId(id).map(_.getName) === Some("E"))
    // register() already cached the id locally -> zero byId round-trips;
    // a FRESH client pays exactly one.
    assert(!requests.exists(_.startsWith("GET /schemas/ids/")))
    val fresh = new HttpSchemaRegistry(base)
    assert(fresh.byId(id).map(_.getName) === Some("E"))
    assert(fresh.byId(id).map(_.getName) === Some("E"))
    assert(requests.count(_ == s"GET /schemas/ids/$id") === 1)
    assert(fresh.byId(999999) === None)
  }

  test("transient 5xx retries then succeeds; latest on an unknown subject is None") {
    val reg = new HttpSchemaRegistry(base)
    failNext = 2
    val id = reg.register("t3-value", schemaV1)
    assert(id > 0, "two 500s then success must be absorbed by the retry budget")
    assert(reg.latest("never-registered-value") === None)
  }

  test("compatibility levels gate evolution direction-correctly (BACKWARD vs FULL)") {
    import graft.serde.CompatibilityLevel
    val reg = new HttpSchemaRegistry(base)
    // BACKWARD (consumers upgrade first): removing a field is fine (the
    // new reader just ignores old data's extra field), but ADDING a
    // field WITHOUT a default is rejected (the new reader cannot fill it
    // from old data).
    reg.setCompatibility("lvl-b-value", CompatibilityLevel.Backward)
    reg.register("lvl-b-value", schemaV1)
    val removed = SchemaBuilder.record("E").namespace("graft")
      .fields().requiredLong("id").endRecord()
    reg.register("lvl-b-value", removed) // shrink: BACKWARD-ok
    val addedNoDefault = SchemaBuilder.record("E").namespace("graft")
      .fields().requiredLong("id").requiredString("alias").endRecord()
    intercept[IncompatibleSchemaException] {
      reg.register("lvl-b-value", addedNoDefault)
    }
    // FULL: the same shrink that BACKWARD allowed is rejected (the OLD
    // reader needs the removed no-default field from new data), while an
    // add WITH a default — compatible both directions — passes.
    reg.setCompatibility("lvl-f-value", CompatibilityLevel.Full)
    reg.register("lvl-f-value", schemaV1)
    intercept[IncompatibleSchemaException] {
      reg.register("lvl-f-value", removed)
    }
    assert(reg.register("lvl-f-value", schemaV2) > 0)
  }

  test("G6 end to end: the registry gate drives the re-snapshot decision") {
    import graft.model.SchemaEvolution
    import graft.model.SchemaEvolution.{ColumnInfo, Probes}
    import graft.serde.CompatibilityLevel
    val reg = new HttpSchemaRegistry(base)
    reg.setCompatibility("g6-value", CompatibilityLevel.Full)
    reg.register("g6-value", schemaV1)

    val oldCols = Map(
      "id" -> ColumnInfo("bigint", isNullable = false),
      "name" -> ColumnInfo("nvarchar"))
    val probes = Probes(oldInstanceAvailable = true, tableIsSmall = true)

    // Evolution 1: a new NULLABLE column. The column diff clears it, the
    // Avro evolution (optional field, null default) passes FULL -> the
    // pipeline continues without re-snapshot.
    val newColsOk = oldCols + ("note" -> ColumnInfo("nvarchar"))
    val evolvedOk = SchemaBuilder.record("E").namespace("graft")
      .fields().requiredLong("id").requiredString("name")
      .name("note").`type`().unionOf().nullType().and().stringType().endUnion()
      .nullDefault().endRecord()
    val d1 = SchemaEvolution.decideWithRegistry(
      SchemaEvolution.requiresNewSnapshot(oldCols, newColsOk, probes),
      () => reg.register("g6-value", evolvedOk))
    assert(!d1.resnapshot, d1.reason)

    // Evolution 2: the column diff ALONE clears it (same Spark-side
    // serialization class is a judgment the engine makes), but the
    // DEPLOYMENT's registry policy rejects the evolved wire schema —
    // the rejection must force the re-snapshot/terminate path.
    val evolvedBreaking = SchemaBuilder.record("E").namespace("graft")
      .fields().requiredLong("id").requiredString("name")
      .requiredString("alias").endRecord() // no default: FULL-incompatible
    val d2 = SchemaEvolution.decideWithRegistry(
      SchemaEvolution.requiresNewSnapshot(
        oldCols, oldCols + ("alias" -> ColumnInfo("nvarchar")), probes),
      () => reg.register("g6-value", evolvedBreaking))
    assert(d2.resnapshot, "registry rejection must drive the decision")
    assert(d2.reason.contains("registry"), d2.reason)

    // Evolution 3: the column diff itself disqualifies (type change) —
    // the registry is never consulted.
    var consulted = false
    val d3 = SchemaEvolution.decideWithRegistry(
      SchemaEvolution.requiresNewSnapshot(
        oldCols, oldCols + ("id" -> ColumnInfo("nvarchar", isNullable = false)),
        probes),
      () => { consulted = true; 0 })
    assert(d3.resnapshot && !consulted,
      "a disqualifying column diff must short-circuit the registry call")
  }

  test("drop-in for the in-memory registry through the AvroSerde encoder path") {
    val reg = new HttpSchemaRegistry(base)
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val (id, enc) = AvroSerde.registeredRowEncoder(reg, "t4_events", st, "E4", "graft")
    val frame = enc.encode(org.apache.spark.sql.Row(7L, "x"))
    assert(frame(0) === 0.toByte) // Confluent magic
    // A consumer resolves the frame's id back through the SAME HTTP
    // surface and decodes.
    val resolved = new HttpSchemaRegistry(base).byId(id).get
    val dec = new AvroSerde.FrameDecoder(resolved.toString)
    val (gotId, rec) = dec.decode(frame)
    assert(gotId === id)
    assert(rec.get("id") === 7L)
    assert(rec.get("name").toString === "x")
  }
}

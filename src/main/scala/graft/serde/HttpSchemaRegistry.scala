package graft.serde

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema

/** HTTP [[SchemaRegistryClient]] speaking the Confluent Schema Registry
  * REST contract (SURVEY §2 F4; the reference talks to the same service
  * through the confluent-kafka client, `serializers/avro.py`):
  *
  *   - `POST /subjects/<subject>/versions` body `{"schema": "..."}` →
  *     `{"id": N}`; HTTP 409 = the registry's compatibility gate
  *     rejected the evolution → [[IncompatibleSchemaException]], the
  *     same surface the in-memory registry raises locally.
  *   - `GET /schemas/ids/<id>` → `{"schema": "..."}`; 404 → None.
  *   - `GET /subjects/<subject>/versions/latest` →
  *     `{"id": N, "schema": "..."}`; 404 (unknown subject) → None.
  *
  * Design notes:
  *   - `byId` results are CACHED forever: Confluent ids are immutable
  *     (an id never re-maps to a different schema), and the decode path
  *     calls `byId` once per record batch — the cache is what makes a
  *     registry round-trip per TOPIC rather than per record, exactly
  *     like the official clients' id cache. `register` caches by
  *     (subject, schema) for the same reason (idempotent on the
  *     server).
  *   - Transient failures (connect errors, 5xx) retry a bounded number
  *     of times; 4xx are NOT retried — they are contract answers
  *     (404 absent, 409 incompatible, 422 invalid).
  *   - JSON in/out is the registry's tiny fixed shape; the parser
  *     handles exactly that shape (string escapes included) rather than
  *     pulling a JSON dependency into the no-egress build.
  *   - driver-side only: executors never talk to the registry — ids
  *     resolve on the driver and ride the plan, the same discipline as
  *     the broadcast codebook/Bloom handles.
  *
  * @param baseUrl   e.g. `http://registry:8081` (no trailing slash)
  * @param basicAuth optional `user:password` for
  *                  `basic.auth.credentials.source=USER_INFO` setups
  */
final class HttpSchemaRegistry(
    baseUrl: String,
    basicAuth: Option[String] = None,
    timeout: Duration = Duration.ofSeconds(10),
    maxRetries: Int = 3,
    client: HttpClient = HttpClient.newHttpClient())
  extends SchemaRegistryClient {

  private val idCache = TrieMap[Int, Schema]()
  private val registerCache = TrieMap[(String, String), Int]()

  private def request(method: String, path: String, body: Option[String])
      : HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
      .timeout(timeout)
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
    basicAuth.foreach { up =>
      b.header("Authorization", "Basic " +
        Base64.getEncoder.encodeToString(up.getBytes(StandardCharsets.UTF_8)))
    }
    body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    val req = b.build()
    var attempt = 0
    var last: Either[Throwable, HttpResponse[String]] = null
    while (attempt <= maxRetries) {
      last =
        try {
          val r = client.send(req, HttpResponse.BodyHandlers.ofString())
          if (r.statusCode() >= 500) Left(new RuntimeException(
            s"registry $method $path: HTTP ${r.statusCode()}"))
          else Right(r)
        } catch { case e: java.io.IOException => Left(e) }
      last match {
        case Right(r) => return r
        case Left(_) =>
          attempt += 1
          // Linear backoff: back-to-back retries would exhaust the
          // budget inside one millisecond-scale outage window (the
          // KafkaRecordProducer consult-retry discipline).
          if (attempt <= maxRetries) Thread.sleep(200L * attempt)
      }
    }
    throw new RuntimeException(
      s"schema registry unreachable after ${maxRetries + 1} attempts: " +
        s"$method $baseUrl$path", last.left.toOption.orNull)
  }

  /** Set the subject's compatibility level (`PUT /config/<subject>`,
    * body `{"compatibility": "<LEVEL>"}`) — the deployment-side policy
    * switch schema evolution (G6) is gated by. */
  def setCompatibility(subject: String, level: CompatibilityLevel.Value): Unit = {
    val resp = request("PUT", s"/config/${MicroJson.urlSeg(subject)}",
      Some(s"""{"compatibility": "${level.toString}"}"""))
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"registry setCompatibility($subject): HTTP ${resp.statusCode()} ${resp.body()}")
  }

  override def register(subject: String, schema: Schema): Int = {
    val canonical = schema.toString // Avro canonical JSON
    registerCache.getOrElseUpdate((subject, canonical), {
      val body = s"""{"schema": ${MicroJson.quote(canonical)}}"""
      val resp = request("POST",
        s"/subjects/${MicroJson.urlSeg(subject)}/versions", Some(body))
      resp.statusCode() match {
        case 200 =>
          val id = MicroJson.intField(resp.body(), "id").getOrElse(
            throw new RuntimeException(s"registry returned no id: ${resp.body()}"))
          idCache.putIfAbsent(id, schema)
          id
        case 409 => throw new IncompatibleSchemaException(
          s"schema for subject '$subject' rejected by the registry's " +
            "compatibility gate (HTTP 409)")
        case other => throw new RuntimeException(
          s"registry register($subject): HTTP $other ${resp.body()}")
      }
    })
  }

  override def byId(id: Int): Option[Schema] =
    idCache.get(id).orElse {
      val resp = request("GET", s"/schemas/ids/$id", None)
      resp.statusCode() match {
        case 200 =>
          val s = MicroJson.stringField(resp.body(), "schema").map(
            raw => new Schema.Parser().parse(raw))
          s.foreach(idCache.putIfAbsent(id, _))
          s
        case 404 => None
        case other => throw new RuntimeException(
          s"registry byId($id): HTTP $other ${resp.body()}")
      }
    }

  override def latest(subject: String): Option[(Int, Schema)] = {
    val resp = request("GET",
      s"/subjects/${MicroJson.urlSeg(subject)}/versions/latest", None)
    resp.statusCode() match {
      case 200 =>
        for {
          id <- MicroJson.intField(resp.body(), "id")
          raw <- MicroJson.stringField(resp.body(), "schema")
        } yield {
          val s = new Schema.Parser().parse(raw)
          idCache.putIfAbsent(id, s)
          (id, s)
        }
      case 404 => None
      case other => throw new RuntimeException(
        s"registry latest($subject): HTTP $other ${resp.body()}")
    }
  }
}

/** The few JSON operations the registry wire shape needs — quoting a
  * string, and extracting one int / one string field from a flat
  * object — with full string-escape handling, so the no-egress build
  * needs no JSON dependency. Not a general parser by design. */
private[graft] object MicroJson {

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  def urlSeg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** Index of the value following `"name":`, or -1. Scans with string
    * awareness (escapes included) so a name embedded in another field's
    * string VALUE cannot alias, and requires the colon so a string value
    * equal to `"name"` doesn't either. */
  private def valueStart(json: String, name: String): Int = {
    val needle = "\"" + name + "\""
    var i = 0
    var inStr = false
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else if (c == '"') {
        if (json.regionMatches(i, needle, 0, needle.length)) {
          // JSON whitespace is space/tab/CR/LF — a pretty-printing
          // server or proxy may emit any of them around the colon.
          def ws(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '\n'
          var j = i + needle.length
          while (j < json.length && ws(json.charAt(j))) j += 1
          if (j < json.length && json.charAt(j) == ':') {
            j += 1
            while (j < json.length && ws(json.charAt(j))) j += 1
            return j
          }
        }
        inStr = true // a key we don't want, or a string value: skip it
      }
      i += 1
    }
    -1
  }

  def intField(json: String, name: String): Option[Int] = {
    val v = valueStart(json, name)
    if (v < 0) None
    else {
      var j = v
      val b = new StringBuilder
      while (j < json.length && (json.charAt(j).isDigit || json.charAt(j) == '-')) {
        b.append(json.charAt(j)); j += 1
      }
      if (b.isEmpty) None else Some(b.toString.toInt)
    }
  }

  def stringField(json: String, name: String): Option[String] = {
    val v = valueStart(json, name)
    if (v < 0 || v >= json.length || json.charAt(v) != '"') None
    else {
      val b = new StringBuilder
      var i = v + 1
      while (i < json.length && json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\' && i + 1 < json.length) {
          json.charAt(i + 1) match {
            case '"' => b.append('"'); i += 2
            case '\\' => b.append('\\'); i += 2
            case '/' => b.append('/'); i += 2
            case 'n' => b.append('\n'); i += 2
            case 'r' => b.append('\r'); i += 2
            case 't' => b.append('\t'); i += 2
            case 'b' => b.append('\b'); i += 2
            case 'f' => b.append('\f'); i += 2
            case 'u' =>
              b.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case other => b.append(other); i += 2
          }
        } else { b.append(c); i += 1 }
      }
      // No terminating quote = truncated/malformed body; a partial
      // schema string handed to Schema.Parser would fail confusingly
      // (or worse, parse) downstream — fail the field lookup instead.
      if (i >= json.length) None else Some(b.toString)
    }
  }
}

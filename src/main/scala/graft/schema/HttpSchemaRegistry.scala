package graft.schema

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.json4s._
import org.json4s.jackson.JsonMethods

/** A real HTTP client for the Confluent Schema Registry REST API —
  * the live counterpart the reference constructs at
  * /root/reference/notebooks/confluent/scala/ingest_raw.scala:129-131
  * (`CachedSchemaRegistryClient`). Speaks the PUBLIC registry wire
  * protocol over JDK `java.net.http` (no vendor jar):
  *
  *   - `POST /subjects/{subject}/versions` `{"schema": <json string>}`
  *     → `{"id": N}` (idempotent: re-posting an identical schema
  *     returns the existing id)
  *   - `GET /schemas/ids/{id}` → `{"schema": <json string>}`
  *   - `GET /subjects/{subject}/versions/latest` → `{..,"id","schema"}`
  *   - `GET /subjects` (only for the Glue-style UUID fallback scan)
  *
  * Like the reference's client, every response is CACHED: a schema id
  * is fetched at most once per process, so the per-record decode path
  * never touches the network. Glue's 16-byte schema-version UUID is
  * derived deterministically from the schema text (same rule as
  * [[InMemorySchemaRegistry]]); resolving an unseen UUID falls back to
  * one subjects scan, then serves from cache.
  *
  * Serializable for closure capture (executors resolve through the
  * driver-populated cache; the HTTP client itself is transient and
  * rebuilt on demand).
  */
class HttpSchemaRegistry(baseUrl: String, maxAttempts: Int = 3,
    backoffMs: Long = 100L) extends SchemaRegistry with Serializable {

  private val base = baseUrl.stripSuffix("/")

  @transient private lazy val http: HttpClient = HttpClient.newHttpClient()

  private val idCache = new TrieMap[Int, Schema]
  private val uuidCache = new TrieMap[UUID, Int]

  private def schemaUuid(schema: Schema): UUID =
    UUID.nameUUIDFromBytes(schema.toString.getBytes(StandardCharsets.UTF_8))

  private def cachePut(id: Int, schema: Schema): Unit = {
    idCache.put(id, schema)
    uuidCache.put(schemaUuid(schema), id)
  }

  /** One HTTP exchange with bounded retry + exponential backoff on
    * TRANSIENT failures only (connect/read errors, 5xx): a registry
    * blip must not abort a whole micro-batch when the next attempt
    * would serve from a healthy replica. Definitive answers — 2xx,
    * 404 (not found), 409 (incompatible), other 4xx — never retry:
    * repeating a semantic rejection only hides it.
    */
  private def sendWithRetry(req: HttpRequest): HttpResponse[String] = {
    var attempt = 0
    while (true) {
      attempt += 1
      val outcome: Either[Throwable, HttpResponse[String]] =
        try {
          val r = http.send(req, HttpResponse.BodyHandlers.ofString())
          if (r.statusCode() / 100 == 5) Left(new java.io.IOException(
            s"schema registry: ${req.method()} ${req.uri()} -> " +
              s"${r.statusCode()}: ${r.body().take(200)}"))
          else Right(r)
        } catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) => return r
        case Left(e) if attempt >= maxAttempts => throw e
        case Left(_) => Thread.sleep(backoffMs * (1L << (attempt - 1)))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def request(method: String, path: String, body: Option[String]): JValue = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
    val req = (body match {
      case Some(payload) =>
        b.method(method, HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = sendWithRetry(req)
    if (resp.statusCode() == 404)
      throw new NoSuchElementException(s"schema registry: $method $path -> 404")
    if (resp.statusCode() == 409)
      // the server-side compatibility gate (the reference pins FULL at
      // producer.scala:60): same exception type as the in-memory gate,
      // so callers handle local and remote rejection identically
      throw new SchemaIncompatibleException(path, "registry",
        Seq(s"rejected with 409: ${resp.body().take(300)}"))
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"schema registry: $method $path -> ${resp.statusCode()}: ${resp.body().take(200)}")
    JsonMethods.parse(resp.body())
  }

  private def jStr(j: JValue, field: String): String = (j \ field) match {
    case JString(s) => s
    case other => throw new java.io.IOException(
      s"schema registry: expected string field '$field', got $other")
  }

  private def jInt(j: JValue, field: String): Int = (j \ field) match {
    case JInt(n) => n.toInt
    case JLong(n) => n.toInt
    case other => throw new java.io.IOException(
      s"schema registry: expected int field '$field', got $other")
  }

  override def register(subject: String, schema: Schema): Int = {
    // the registry API takes the schema as a JSON-encoded STRING field
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("schema" -> JString(schema.toString))))
    val id = jInt(request("POST", s"/subjects/$subject/versions", Some(body)), "id")
    cachePut(id, schema)
    id
  }

  override def getById(id: Int): Schema =
    idCache.getOrElse(id, {
      val schema = new Schema.Parser().parse(
        jStr(request("GET", s"/schemas/ids/$id", None), "schema"))
      cachePut(id, schema)
      schema
    })

  override def getByUuid(uuid: UUID): Schema = getById(idFor(uuid))

  override def uuidFor(id: Int): UUID = schemaUuid(getById(id))

  override def idFor(uuid: UUID): Int =
    uuidCache.getOrElse(uuid, {
      // Confluent's API has no UUID lookup (that is Glue's notion) —
      // one subjects scan repopulates the cache, then we either know
      // it or the registry genuinely does not hold this schema text.
      // EVERY version of every subject is fetched, not just latest:
      // data on disk is routinely one schema evolution behind, and its
      // UUID resolves to an OLDER version the registry still holds
      request("GET", "/subjects", None) match {
        case JArray(subjects) => subjects.foreach {
          case JString(s) =>
            request("GET", s"/subjects/$s/versions", None) match {
              case JArray(versions) => versions.foreach {
                case v @ (JInt(_) | JLong(_)) =>
                  val vj = request("GET", s"/subjects/$s/versions/${v.values}", None)
                  cachePut(jInt(vj, "id"),
                    new Schema.Parser().parse(jStr(vj, "schema")))
                case _ => ()
              }
              case _ => ()
            }
          case _ => ()
        }
        case _ => ()
      }
      uuidCache.getOrElse(uuid,
        throw new NoSuchElementException(s"schema uuid $uuid not in registry"))
    })

  /** `PUT /config/{subject}` — pin the subject's compatibility mode
    * (the reference does exactly this with FULL, producer.scala:60);
    * later incompatible registrations come back as 409 →
    * [[SchemaIncompatibleException]].
    */
  def setCompatibility(subject: String, mode: Compatibility): Unit = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("compatibility" -> JString(mode.name))))
    request("PUT", s"/config/$subject", Some(body))
    ()
  }

  /** `GET /config/{subject}` — the enforced mode, or None when the
    * subject inherits the registry-wide default.
    */
  def getCompatibility(subject: String): Option[Compatibility] =
    try Some(Compatibility.of(
      jStr(request("GET", s"/config/$subject", None), "compatibilityLevel")))
    catch { case _: NoSuchElementException => scala.None }

  /** `POST /compatibility/subjects/{subject}/versions` — the
    * registry's own admission predicate, without registering. The
    * all-versions form (not `/latest`): the server then checks
    * against latest or full history per the subject's own mode, so
    * *_TRANSITIVE subjects answer the same predicate `register`
    * enforces. A subject with no versions yet (404) is vacuously
    * admissible — matching [[InMemorySchemaRegistry.testCompatibility]].
    */
  def testCompatibility(subject: String, schema: Schema): Boolean = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("schema" -> JString(schema.toString))))
    try (request("POST", s"/compatibility/subjects/$subject/versions",
      Some(body)) \ "is_compatible") match {
      case JBool(b) => b
      case other => throw new java.io.IOException(
        s"schema registry: expected boolean 'is_compatible', got $other")
    } catch { case _: NoSuchElementException => true }
  }

  override def latest(subject: String): Option[(Int, Schema)] =
    try {
      val j = request("GET", s"/subjects/$subject/versions/latest", None)
      val schema = new Schema.Parser().parse(jStr(j, "schema"))
      val id = jInt(j, "id")
      cachePut(id, schema)
      Some((id, schema))
    } catch { case _: NoSuchElementException => None }
}

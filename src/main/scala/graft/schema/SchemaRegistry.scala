package graft.schema

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema

/** Local stand-in for the external Avro schema registries the
  * reference talks to at runtime (Confluent CachedSchemaRegistryClient
  * at ingest_raw.scala:129-131, AWS Glue facade at ingest.scala:134-136).
  *
  * Same contract: schemas are registered per subject, resolved by a
  * compact id that travels inside each record's framed value bytes.
  * Confluent framing uses the int id; Glue framing uses a 16-byte
  * version UUID — we derive it deterministically from the schema text
  * so re-registration is idempotent across processes.
  */
trait SchemaRegistry {
  def register(subject: String, schema: Schema): Int
  def getById(id: Int): Schema
  def getByUuid(uuid: UUID): Schema
  def uuidFor(id: Int): UUID
  def idFor(uuid: UUID): Int
  def latest(subject: String): Option[(Int, Schema)]
}

/** @param defaultCompatibility gate applied to every subject without
  *   a per-subject override — FULL by default, matching the mode the
  *   reference pins on its subject (producer.scala:60): incompatible
  *   evolutions are REJECTED at registration, not discovered as
  *   decode failures downstream. Use [[setCompatibility]] for
  *   per-subject overrides (the `PUT /config/{subject}` role).
  */
class InMemorySchemaRegistry(
    val defaultCompatibility: Compatibility = Compatibility.Full)
  extends SchemaRegistry with Serializable {
  private val byId = new TrieMap[Int, Schema]
  private val byUuid = new TrieMap[UUID, Int]
  private val subjects = new TrieMap[String, List[Int]]
  private val subjectModes = new TrieMap[String, Compatibility]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def schemaUuid(schema: Schema): UUID =
    UUID.nameUUIDFromBytes(schema.toString.getBytes(StandardCharsets.UTF_8))

  /** Per-subject compatibility override (`PUT /config/{subject}`). */
  def setCompatibility(subject: String, mode: Compatibility): Unit =
    subjectModes.put(subject, mode)

  /** The mode [[register]] enforces for `subject`. */
  def compatibilityOf(subject: String): Compatibility =
    subjectModes.getOrElse(subject, defaultCompatibility)

  /** Would `schema` be admitted for `subject` right now? (`POST
    * /compatibility/subjects/{s}/versions/latest` role — same
    * predicate [[register]] enforces, without registering.)
    */
  def testCompatibility(subject: String, schema: Schema): Seq[String] =
    Compatibility.violations(compatibilityOf(subject), schema,
      subjects.getOrElse(subject, Nil).reverse.map(byId(_)))

  override def register(subject: String, schema: Schema): Int = synchronized {
    val existing = subjects.getOrElse(subject, Nil)
      .find(id => byId(id).toString == schema.toString)
    existing.getOrElse {
      // gate BEFORE allocating: an identical re-register above is
      // always idempotent-ok, a genuinely new version must satisfy
      // the subject's compatibility mode against its history
      val problems = testCompatibility(subject, schema)
      if (problems.nonEmpty)
        throw new SchemaIncompatibleException(subject,
          compatibilityOf(subject).name, problems)
      val id = nextId.incrementAndGet()
      byId.put(id, schema)
      byUuid.put(schemaUuid(schema), id)
      subjects.put(subject, subjects.getOrElse(subject, Nil) :+ id)
      id
    }
  }

  override def getById(id: Int): Schema =
    byId.getOrElse(id, throw new NoSuchElementException(s"schema id $id not registered"))

  override def getByUuid(uuid: UUID): Schema = getById(idFor(uuid))

  override def uuidFor(id: Int): UUID = schemaUuid(getById(id))

  override def idFor(uuid: UUID): Int =
    byUuid.getOrElse(uuid, throw new NoSuchElementException(s"schema uuid $uuid not registered"))

  override def latest(subject: String): Option[(Int, Schema)] =
    subjects.get(subject).flatMap(_.lastOption).map(id => (id, byId(id)))

  /** Registered subject names (the REST API's `GET /subjects`). */
  def subjectNames: Seq[String] = subjects.keys.toSeq.sorted

  /** A subject's schema ids in registration (version) order (the REST
    * API's `GET /subjects/{s}/versions`, where version n maps to the
    * n-th registered id).
    */
  def versionIds(subject: String): Seq[Int] = subjects.getOrElse(subject, Nil)
}

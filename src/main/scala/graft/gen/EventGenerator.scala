package graft.gen

import java.util.UUID

import scala.util.Random

import org.apache.avro.generic.GenericData
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.codec.{AvroBinary, ConfluentWire, GlueWire, WireFormat}
import graft.schema.{ProductSchemas, SchemaRegistry}

/** The Kafka record envelope as a case class (for MemoryStream
  * encoders) — the exact columns the reference's ingest consumes
  * (ingest.scala:55-63).
  */
case class KafkaEnvelope(key: Array[Byte], value: Array[Byte], topic: String,
                         partition: Int, offset: Long,
                         timestamp: java.sql.Timestamp, timestampType: Int)

/** One generated Product event (v1 events carry None size/color). */
case class ProductEvent(
    productId: String,
    eventId: String,
    productType: String,
    timestamp: Long,
    size: Option[String],
    color: Option[String]) {
  def isV2: Boolean = size.isDefined
}

/** Deterministic, seeded replacement for the reference's driver-side
  * producers (producer.scala:132-178, producer.py:113-186): same value
  * domains, same v1:v2 = 1:2 mix (`counter % 3 == 0` → v1,
  * producer.scala:169-171), epoch-second timestamps, UUID eventIds.
  * Doubles as the test fixture generator (FIXTURES.md §1) — it can
  * inject duplicate eventIds (for dedup tests) and corrupt payloads
  * (for PERMISSIVE/FAILFAST tests).
  */
class EventGenerator(seed: Long = 42L, baseEpochSec: Long = 1704067200L /* 2024-01-01 */) {

  private val rnd = new Random(seed)

  def next(counter: Int): ProductEvent = {
    val v1 = counter % 3 == 0
    ProductEvent(
      productId = ProductSchemas.productIds(rnd.nextInt(ProductSchemas.productIds.size)),
      eventId = new UUID(rnd.nextLong(), rnd.nextLong()).toString,
      productType = ProductSchemas.types(rnd.nextInt(ProductSchemas.types.size)),
      timestamp = baseEpochSec + counter,
      size = if (v1) None else Some(ProductSchemas.sizes(rnd.nextInt(ProductSchemas.sizes.size))),
      color = if (v1) None else Some(ProductSchemas.colors(rnd.nextInt(ProductSchemas.colors.size))))
  }

  def events(n: Int, duplicateEvery: Int = 0): Seq[ProductEvent] = {
    val base = (0 until n).map(next)
    if (duplicateEvery <= 0) base
    else base.zipWithIndex.map { case (e, i) =>
      // replay the previous event wholesale (an at-least-once
      // duplicate) to exercise silver's dedup (A4) — a full replay,
      // so any dedup winner is equivalent
      if (i > 0 && i % duplicateEvery == 0) base(i - 1) else e
    }
  }

  /** Avro-encode one event with its version's writer schema. */
  def encode(e: ProductEvent): Array[Byte] = {
    val schema = if (e.isV2) ProductSchemas.v2 else ProductSchemas.v1
    val rec = new GenericData.Record(schema)
    rec.put("productId", e.productId)
    rec.put("eventId", e.eventId)
    rec.put("type", e.productType)
    rec.put("timestamp", e.timestamp)
    if (e.isV2) { rec.put("size", e.size.get); rec.put("color", e.color.get) }
    AvroBinary.encode(rec, schema)
  }

  /** Frame one event's bytes for the given wire format, registering
    * schemas in the registry (serializer-side auto-registration,
    * producer.scala:61).
    */
  def frame(e: ProductEvent, registry: SchemaRegistry, wire: WireFormat,
            subject: String = "product-value"): Array[Byte] = {
    val schema = if (e.isV2) ProductSchemas.v2 else ProductSchemas.v1
    val id = registry.register(subject, schema)
    val payload = encode(e)
    wire match {
      case ConfluentWire => ConfluentWire.frame(id, payload)
      case GlueWire => GlueWire.frame(registry.uuidFor(id), payload)
    }
  }

  /** Kafka envelope schema — exactly the columns the reference's
    * ingest projects (ingest.scala:155-161).
    */
  def envelopeSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  def envelopeRow(e: ProductEvent, offset: Long, topic: String = "products",
                  registry: SchemaRegistry, wire: WireFormat): Row = {
    val key = rnd.nextInt(4).toString.getBytes("UTF-8") // partition-spreading key, producer.py:175
    Row(key, frame(e, registry, wire), topic, (offset % 4).toInt, offset,
      new java.sql.Timestamp(e.timestamp * 1000L), 0)
  }

  /** Batch DataFrame of framed events in the Kafka envelope shape. */
  def envelopeDF(spark: SparkSession, es: Seq[ProductEvent], registry: SchemaRegistry,
                 wire: WireFormat): DataFrame = {
    val rows = es.zipWithIndex.map { case (e, i) => envelopeRow(e, i.toLong, "products", registry, wire) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), envelopeSchema)
  }

  /** Framed envelopes as case-class instances (MemoryStream input). */
  def envelopes(es: Seq[ProductEvent], registry: SchemaRegistry, wire: WireFormat,
                startOffset: Long = 0L): Seq[KafkaEnvelope] =
    es.zipWithIndex.map { case (e, i) =>
      KafkaEnvelope(
        key = rnd.nextInt(4).toString.getBytes("UTF-8"),
        value = frame(e, registry, wire),
        topic = "products", partition = (i % 4), offset = startOffset + i,
        timestamp = new java.sql.Timestamp(e.timestamp * 1000L), timestampType = 0)
    }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

import graft.codec.{ConfluentWire, GlueWire}
import graft.functions.AvroEncode
import graft.schema.SchemaRegistry

/** Kafka source/sink wiring for the two deployments the reference
  * targets (Confluent SASL_SSL at ingest_raw.scala:86-98, MSK
  * plaintext at ingest.scala:54-61), plus the framed-Avro producer
  * projection (SNK5's idiomatic form: `to_avro(struct(*)) AS value`).
  *
  * These builders produce standard `format("kafka")` plans; executing
  * them requires the spark-sql-kafka connector on the cluster
  * classpath (not shipped in this offline environment — the rest of
  * the pipeline is source-agnostic and is tested against
  * MemoryStream/parquet sources with the identical envelope schema).
  */
object KafkaIO {

  /** Per-topic-per-partition JSON start offsets, e.g.
    * `startingOffsetsJson("products", Map(0 -> 25L))` →
    * `{"products":{"0":25}}` (-2 earliest, -1 latest) — the exact
    * option shape of ingest_raw.scala:80-84.
    */
  def startingOffsetsJson(topic: String, partitionOffsets: Map[Int, Long]): String =
    partitionOffsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }
      .mkString(s"""{"$topic":{""", ",", "}}")

  /** SASL_SSL PLAIN auth options (Confluent-style). */
  def saslOptions(apiKey: String, apiSecret: String): Map[String, String] = Map(
    "kafka.security.protocol" -> "SASL_SSL",
    "kafka.sasl.mechanism" -> "PLAIN",
    "kafka.sasl.jaas.config" ->
      ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
        s"""username="$apiKey" password="$apiSecret";"""))

  /** Streaming Kafka reader producing the standard envelope schema
    * (key, value, topic, partition, offset, timestamp, timestampType).
    */
  def reader(spark: SparkSession, bootstrapServers: String, topic: String,
             startingOffsets: String = "latest",
             extraOptions: Map[String, String] = Map.empty): DataStreamReader = {
    val r = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
    extraOptions.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Confluent-framed producer projection: `key` + framed Avro
    * `value` columns ready for `writeStream.format("kafka")`. The
    * schema id is resolved once, driver-side, and the 5-byte header
    * enters the plan as a literal — no per-row registry traffic.
    */
  def confluentProducerProjection(df: DataFrame, keyCol: Column, payloadStruct: Column,
                                  registry: SchemaRegistry, subject: String,
                                  schema: org.apache.avro.Schema): DataFrame = {
    val id = registry.register(subject, schema)
    val header = java.nio.ByteBuffer.allocate(5)
      .put(ConfluentWire.Magic).putInt(id).array()
    df.select(
      keyCol.cast("binary").as("key"),
      concat(lit(header), AvroEncode.toAvro(payloadStruct, schema.toString)).as("value"))
  }

  /** Glue-framed producer projection (18-byte header literal). */
  def glueProducerProjection(df: DataFrame, keyCol: Column, payloadStruct: Column,
                             registry: SchemaRegistry, subject: String,
                             schema: org.apache.avro.Schema): DataFrame = {
    val id = registry.register(subject, schema)
    val uuid = registry.uuidFor(id)
    val header = java.nio.ByteBuffer.allocate(GlueWire.headerSize)
      .put(GlueWire.HeaderVersion).put(GlueWire.NoCompression)
      .putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
      .array()
    df.select(
      keyCol.cast("binary").as("key"),
      concat(lit(header), AvroEncode.toAvro(payloadStruct, schema.toString)).as("value"))
  }
}

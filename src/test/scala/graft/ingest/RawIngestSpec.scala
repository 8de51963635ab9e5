package graft.ingest

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.codec.{ConfluentWire, GlueWire}
import graft.gen.EventGenerator
import graft.schema.InMemorySchemaRegistry

class RawIngestSpec extends SparkTestBase {

  test("demux splits a mixed v1/v2 batch by schema and decodes each group (Confluent)") {
    val gen = new EventGenerator(seed = 1)
    val registry = new InMemorySchemaRegistry
    val es = gen.events(90)
    val batch = gen.envelopeDF(spark, es, registry, ConfluentWire)
    val raw = tmpDir("raw-confluent")
    RawIngest.demuxToTable(batch, registry, ConfluentWire, raw)
    val out = RawIngest.readRaw(spark, raw).select(col("parsedValue.*"))
    assert(out.count() == 90)
    // 1:2 v1:v2 mix — v1 rows decode with the v1 schema, so size/color are null after merge
    assert(out.filter(col("size").isNull).count() == 30)
    assert(out.filter(col("color") === "red").count() > 0)
    // every eventId survived exactly once
    assert(out.select("eventId").distinct().count() == 90)
  }

  test("demux works for the Glue wire format (uuid header demux)") {
    val gen = new EventGenerator(seed = 2)
    val registry = new InMemorySchemaRegistry
    val batch = gen.envelopeDF(spark, gen.events(30), registry, GlueWire)
    val raw = tmpDir("raw-glue")
    RawIngest.demuxToTable(batch, registry, GlueWire, raw)
    val out = RawIngest.readRaw(spark, raw)
    assert(out.count() == 30)
    assert(out.select("parsedValue.productId").distinct().count() <= 3)
  }

  test("unifiedWrite appends one merged batch with identical read semantics") {
    val gen = new EventGenerator(seed = 6)
    val registry = new InMemorySchemaRegistry
    val batch = gen.envelopeDF(spark, gen.events(60), registry, ConfluentWire)
    val raw = tmpDir("raw-unified")
    RawIngest.demuxToTable(batch, registry, ConfluentWire, raw, unifiedWrite = true)
    val out = RawIngest.readRaw(spark, raw).select(col("parsedValue.*"))
    assert(out.count() == 60)
    assert(out.filter(col("size").isNull).count() == 20) // v1 rows null-padded
    assert(out.filter(col("color").isNotNull).count() == 40)
  }

  test("atomic commit: a crash between staging and publish leaves NOTHING visible; " +
    "publish is one rename; replays are idempotent") {
    val gen = new EventGenerator(seed = 11)
    val registry = new InMemorySchemaRegistry
    val batch = gen.envelopeDF(spark, gen.events(60), registry, ConfluentWire)
    val raw = tmpDir("raw-atomic")

    // crash injection: stage the full multi-schema batch, then "die"
    // before the publish rename — a reader must see an EMPTY table
    // (the per-group append loop would already expose partial groups)
    RawIngest.stageBatch(batch, registry, ConfluentWire, raw, batchId = 0L)
    val rootFiles = new java.io.File(raw).listFiles()
    assert(rootFiles != null && rootFiles.forall(_.getName.startsWith(".")),
      "staged data leaked outside the invisible staging dir")
    // parquet discovery sees no data files at all
    intercept[Exception] { spark.read.parquet(raw).count() }

    // recovery replay of the same batch: restages and publishes all
    // groups in one rename
    RawIngest.demuxToTableAtomic(batch, registry, ConfluentWire, raw, batchId = 0L)
    val out = RawIngest.readRaw(spark, raw)
    assert(out.count() == 60)
    assert(out.select("parsedValue.eventId").distinct().count() == 60)
    // the commit id is queryable lineage (discovery infers it as int)
    assert(out.select("ingest_batch").distinct().collect()
      .map(_.getAs[Number](0).longValue).toSeq == Seq(0L))

    // at-least-once replay of a PUBLISHED batch is a no-op (no dupes)
    RawIngest.demuxToTableAtomic(batch, registry, ConfluentWire, raw, batchId = 0L)
    assert(RawIngest.readRaw(spark, raw).count() == 60)

    // a second batch publishes alongside the first
    val batch2 = gen.envelopeDF(spark, gen.events(30), registry, ConfluentWire)
    RawIngest.demuxToTableAtomic(batch2, registry, ConfluentWire, raw, batchId = 1L)
    assert(RawIngest.readRaw(spark, raw).count() == 90)
  }

  test("unknown schema id: fails the batch by default, dead-letters when configured") {
    val gen = new EventGenerator(seed = 5)
    val registry = new InMemorySchemaRegistry
    val good = gen.envelopeDF(spark, gen.events(9), registry, ConfluentWire)
    // a record framed with an id the consumer registry has never seen
    val strangerValue = ConfluentWire.frame(9999, gen.encode(gen.next(1)))
    val stranger = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(strangerValue))
    val batch = good.unionByName(stranger)

    intercept[NoSuchElementException] {
      RawIngest.demuxToTable(batch, registry, ConfluentWire, tmpDir("raw-unknown"))
    }

    val raw = tmpDir("raw-dlq-main")
    val dlq = tmpDir("raw-dlq")
    RawIngest.demuxToTable(batch, registry, ConfluentWire, raw, deadLetterPath = Some(dlq))
    assert(RawIngest.readRaw(spark, raw).count() == 9)
    val dead = spark.read.parquet(dlq)
    assert(dead.count() == 1)
    // dead letters keep the raw framed value for replay
    assert(dead.select("value").collect().head.getAs[Array[Byte]](0).sameElements(strangerValue))
  }

  test("truncated value (shorter than the wire header) dead-letters instead of crashing") {
    val gen = new EventGenerator(seed = 8)
    val registry = new InMemorySchemaRegistry
    val good = gen.envelopeDF(spark, gen.events(6), registry, ConfluentWire)
    val poison = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(Array[Byte](0, 1, 2))) // 3 bytes < 5-byte header
    val batch = good.unionByName(poison)
    val raw = tmpDir("raw-poison-main")
    val dlq = tmpDir("raw-poison-dlq")
    RawIngest.demuxToTable(batch, registry, ConfluentWire, raw, deadLetterPath = Some(dlq))
    assert(RawIngest.readRaw(spark, raw).count() == 6)
    assert(spark.read.parquet(dlq).count() == 1)
  }

  test("permissive ingest drops corrupt rows; failfast propagates") {
    val gen = new EventGenerator(seed = 3)
    val registry = new InMemorySchemaRegistry
    val good = gen.envelopeDF(spark, gen.events(12), registry, ConfluentWire)
    // corrupt: valid framing + valid schema id, truncated payload
    val id = registry.latest("product-value").get._1
    val corruptValue = ConfluentWire.frame(id, Array[Byte](1))
    val corrupt = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(corruptValue))
    val batch = good.unionByName(corrupt)

    val rawPermissive = tmpDir("raw-permissive")
    RawIngest.demuxToTable(batch, registry, ConfluentWire, rawPermissive, permissive = true)
    assert(RawIngest.readRaw(spark, rawPermissive).count() == 12)

    val rawFailfast = tmpDir("raw-failfast")
    intercept[Exception] {
      RawIngest.demuxToTable(batch, registry, ConfluentWire, rawFailfast, permissive = false)
    }
  }

  test("known-id corrupt payloads dead-letter per ROW; healthy groups still commit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gen = new EventGenerator(seed = 13)
    val registry = new InMemorySchemaRegistry
    // mixed batch: v1 + v2 events (two healthy groups) + one record
    // with a VALID id but garbage payload (rogue producer)
    val events = gen.events(20)
    val good = gen.envelopeDF(spark, events, registry, ConfluentWire)
    val id = registry.latest("product-value").get._1
    val corruptValue = ConfluentWire.frame(id, Array[Byte](7))
    val corrupt = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(corruptValue))
    val batch = good.unionByName(corrupt)
    val raw = tmpDir("raw-rowdlq-main")
    val dlq = tmpDir("raw-rowdlq")
    // even under FAILFAST semantics (permissive = false), a configured
    // DLQ isolates the bad ROW instead of wedging the batch
    RawIngest.demuxToTable(batch, registry, ConfluentWire, raw,
      permissive = false, deadLetterPath = Some(dlq))
    val out = RawIngest.readRaw(spark, raw)
    assert(out.count() == 20, "every healthy row of every group must land")
    assert(out.where(col("parsedValue").isNull).count() == 0)
    val dead = spark.read.parquet(dlq)
    assert(dead.count() == 1)
    assert(dead.select("value").collect().head.getAs[Array[Byte]](0)
      .sameElements(corruptValue), "the DLQ must hold the raw framed bytes")

    // end-to-end through the STREAMING ingest: the checkpoint advances
    // past the poisoned batch (one bad producer no longer wedges the
    // pipeline) and a later clean batch still lands
    val stream = MemoryStream[graft.gen.KafkaEnvelope]
    val sraw = tmpDir("raw-rowdlq-stream")
    val sdlq = tmpDir("raw-rowdlq-sdlq")
    val ck = tmpDir("raw-rowdlq-ck")
    stream.addData(gen.envelopes(gen.events(10), registry, ConfluentWire) :+
      graft.gen.KafkaEnvelope(Array[Byte](0), corruptValue, "t", 0, 0L,
        new java.sql.Timestamp(0L), 0))
    RawIngest.run(stream.toDF(), registry, ConfluentWire, sraw, ck,
      deadLetterPath = Some(sdlq)).awaitTermination()
    stream.addData(gen.envelopes(gen.events(5), registry, ConfluentWire))
    RawIngest.run(stream.toDF(), registry, ConfluentWire, sraw, ck,
      deadLetterPath = Some(sdlq)).awaitTermination()
    assert(RawIngest.readRaw(spark, sraw).count() == 15,
      "both batches' healthy rows must land across restarts")
    assert(spark.read.parquet(sdlq).count() == 1)
  }

  test("dlqCorrupt=false: the DLQ covers ONLY unknown ids; corrupt known-id payloads keep FAILFAST") {
    val gen = new EventGenerator(seed = 21)
    val registry = new InMemorySchemaRegistry
    val good = gen.envelopeDF(spark, gen.events(8), registry, ConfluentWire)
    val id = registry.latest("product-value").get._1
    val corruptValue = ConfluentWire.frame(id, Array[Byte](9))
    val corrupt = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(corruptValue))
    // strict combination: a known-id corrupt payload fails the batch
    // even though a DLQ is configured (the pre-round-8 contract)
    val raw = tmpDir("raw-strictdlq-main")
    val dlq = tmpDir("raw-strictdlq")
    intercept[Exception] {
      RawIngest.demuxToTable(good.unionByName(corrupt), registry, ConfluentWire,
        raw, permissive = false, deadLetterPath = Some(dlq), dlqCorrupt = false)
    }
    // ...while an UNKNOWN schema id still dead-letters under the same flag
    val strangerValue = ConfluentWire.frame(9999, Array[Byte](1, 2, 3))
    val stranger = gen.envelopeDF(spark, gen.events(1), registry, ConfluentWire)
      .withColumn("value", lit(strangerValue))
    val raw2 = tmpDir("raw-strictdlq-main2")
    RawIngest.demuxToTable(good.unionByName(stranger), registry, ConfluentWire,
      raw2, permissive = false, deadLetterPath = Some(dlq), dlqCorrupt = false)
    assert(RawIngest.readRaw(spark, raw2).count() == 8)
    assert(spark.read.parquet(dlq).count() == 1)
    assert(spark.read.parquet(dlq).select("value").collect().head
      .getAs[Array[Byte]](0).sameElements(strangerValue))
  }
}

package graft.codec

import java.util.UUID

import org.apache.avro.generic.GenericData
import org.apache.spark.SparkException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.AvroDecode
import graft.schema.ProductSchemas

class AvroCodecSpec extends SparkTestBase {

  private def v2Record(eventId: String = "e-1"): Array[Byte] = {
    val rec = new GenericData.Record(ProductSchemas.v2)
    rec.put("productId", "p-1"); rec.put("eventId", eventId)
    rec.put("type", "shirt"); rec.put("timestamp", 1704067200L)
    rec.put("size", "m"); rec.put("color", "red")
    AvroBinary.encode(rec, ProductSchemas.v2)
  }

  private def v1Record(): Array[Byte] = {
    val rec = new GenericData.Record(ProductSchemas.v1)
    rec.put("productId", "p-1"); rec.put("eventId", "e-0")
    rec.put("type", "pants"); rec.put("timestamp", 1704067201L)
    AvroBinary.encode(rec, ProductSchemas.v1)
  }

  test("Confluent framing round-trips") {
    val (id, payload) = ConfluentWire.unframe(ConfluentWire.frame(7, v2Record()))
    assert(id == 7)
    assert(payload.sameElements(v2Record()))
  }

  test("Glue framing round-trips") {
    val uuid = UUID.nameUUIDFromBytes("s".getBytes)
    val (u, payload) = GlueWire.unframe(GlueWire.frame(uuid, v1Record()))
    assert(u == uuid)
    assert(payload.sameElements(v1Record()))
  }

  test("Avro binary round-trips with schema resolution v1 -> v2 defaults") {
    val rec = AvroBinary.decode(v1Record(), ProductSchemas.v1, ProductSchemas.v2)
    assert(rec.get("type").toString == "pants")
    assert(rec.get("size").toString == "none") // v2 reader default fills in
    assert(rec.get("color").toString == "none")
  }

  test("AvroDecode expression decodes to a struct column") {
    import spark.implicits._
    val df = Seq(v2Record()).toDF("payload")
      .select(AvroDecode.fromAvro(col("payload"), ProductSchemas.v2Json).as("parsedValue"))
      .select(col("parsedValue.*"))
    val row = df.collect().head
    assert(row.getAs[String]("type") == "shirt")
    assert(row.getAs[String]("color") == "red")
    assert(row.getAs[Long]("timestamp") == 1704067200L)
  }

  test("AvroDecode PERMISSIVE yields null on corrupt payload, FAILFAST throws") {
    import spark.implicits._
    // a truncated record: valid string then EOF mid-field
    val corrupt = v2Record().take(3)
    val permissive = Seq(corrupt).toDF("payload")
      .select(AvroDecode.fromAvro(col("payload"), ProductSchemas.v2Json,
        ProductSchemas.v2Json, permissive = true).as("v"))
    assert(permissive.collect().head.isNullAt(0))
    val failfast = Seq(corrupt).toDF("payload")
      .select(AvroDecode.fromAvro(col("payload"), ProductSchemas.v2Json).as("v"))
    intercept[Exception] { failfast.collect() } // EOFException locally, SparkException on a cluster
  }

  test("column-level framing extractors agree with byte-level codec") {
    import spark.implicits._
    val framedC = ConfluentWire.frame(42, v2Record())
    val dfC = Seq(framedC).toDF("value").select(
      ConfluentWire.schemaIdCol(col("value")).as("id"),
      ConfluentWire.payloadCol(col("value")).as("payload"))
    val rowC = dfC.collect().head
    assert(rowC.getAs[Int]("id") == 42)
    assert(rowC.getAs[Array[Byte]]("payload").sameElements(v2Record()))

    val uuid = UUID.randomUUID()
    val framedG = GlueWire.frame(uuid, v1Record())
    val dfG = Seq(framedG).toDF("value").select(
      GlueWire.schemaKeyCol(col("value")).as("header"),
      GlueWire.payloadCol(col("value")).as("payload"))
    val rowG = dfG.collect().head
    assert(GlueWire.uuidOf(rowG.getAs[Array[Byte]]("header")) == uuid)
    assert(rowG.getAs[Array[Byte]]("payload").sameElements(v1Record()))
  }
}

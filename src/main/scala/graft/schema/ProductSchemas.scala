package graft.schema

import org.apache.avro.Schema
import org.apache.spark.sql.types._

/** The reference's Product event schema in its two versions.
  *
  * Semantics mirror /root/reference/schema/product-v1.avsc:3-27 (4
  * fields) and product-v2.avsc:3-39 (adds `size`/`color`, both
  * defaulted "none" — a backward-compatible widening enforced
  * Compatibility.FULL at producer.scala:60). Value domains:
  * type ∈ {shirt,pants,shoes}, color ∈ {black,blue,red},
  * size ∈ {xs,s,m,l,xl} (producer.scala:76-92).
  */
object ProductSchemas {

  val namespace = "graft.product"

  val v1Json: String =
    s"""{"type":"record","name":"Product","namespace":"$namespace","fields":[
       |{"name":"productId","type":"string"},
       |{"name":"eventId","type":"string"},
       |{"name":"type","type":"string"},
       |{"name":"timestamp","type":"long"}]}""".stripMargin.replaceAll("\n", "")

  val v2Json: String =
    s"""{"type":"record","name":"Product","namespace":"$namespace","fields":[
       |{"name":"productId","type":"string"},
       |{"name":"eventId","type":"string"},
       |{"name":"type","type":"string"},
       |{"name":"timestamp","type":"long"},
       |{"name":"size","type":"string","default":"none"},
       |{"name":"color","type":"string","default":"none"}]}""".stripMargin.replaceAll("\n", "")

  /** An INCOMPATIBLE evolution for compatibility-gate tests: changes
    * `timestamp` long → string, which neither direction of Avro
    * schema resolution can bridge — the registration the reference's
    * FULL-pinned subject (producer.scala:60) must reject.
    */
  val v3IncompatibleJson: String =
    s"""{"type":"record","name":"Product","namespace":"$namespace","fields":[
       |{"name":"productId","type":"string"},
       |{"name":"eventId","type":"string"},
       |{"name":"type","type":"string"},
       |{"name":"timestamp","type":"string"}]}""".stripMargin.replaceAll("\n", "")

  def v1: Schema = new Schema.Parser().parse(v1Json)
  def v2: Schema = new Schema.Parser().parse(v2Json)
  def v3Incompatible: Schema = new Schema.Parser().parse(v3IncompatibleJson)

  val v1Struct: StructType = StructType(Seq(
    StructField("productId", StringType, nullable = false),
    StructField("eventId", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val v2Struct: StructType = v1Struct
    .add(StructField("size", StringType, nullable = false))
    .add(StructField("color", StringType, nullable = false))

  val types: Seq[String] = Seq("shirt", "pants", "shoes")
  val colors: Seq[String] = Seq("black", "blue", "red")
  val sizes: Seq[String] = Seq("xs", "s", "m", "l", "xl")

  /** The three fixed product ids of producer.scala:77-81 (any stable
    * 32-hex ids; values are arbitrary).
    */
  val productIds: Seq[String] = Seq(
    "6e4f0cf56c73402c9b5ef1ea01e0fa19",
    "a7c2d1bb4e0f44f78d3b6a2f9c8e5d01",
    "0412fd3a9d8845b0a1c6e7f2b3d4c5a6")
}

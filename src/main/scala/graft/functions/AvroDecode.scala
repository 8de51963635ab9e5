package graft.functions

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro-schema → Catalyst type mapping and value conversion for
  * [[AvroDecode]]. Covers the types the Product pipeline and its
  * extensions need: primitives, [null, T] unions, enum/fixed, and
  * nested record/array/map.
  */
object AvroCatalyst {

  def toSqlType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.NULL => NullType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name(), toSqlType(f.schema()), nullable = isNullable(f.schema()))
      })
    case Schema.Type.ARRAY => ArrayType(toSqlType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSqlType(s.getValueType))
    case Schema.Type.UNION => toSqlType(nonNullBranch(s))
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1, s"only [null, T] unions supported, got $s")
    branches.head
  }

  def toCatalyst(v: Any, s: Schema): Any = {
    if (v == null) return null
    s.getType match {
      case Schema.Type.UNION => toCatalyst(v, nonNullBranch(s))
      case Schema.Type.STRING | Schema.Type.ENUM => UTF8String.fromString(v.toString)
      case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
           Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        val fields = s.getFields.asScala
        val out = new Array[Any](fields.size)
        var i = 0
        while (i < fields.size) {
          out(i) = toCatalyst(rec.get(i), fields(i).schema()); i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
      case Schema.Type.ARRAY =>
        val xs = v.asInstanceOf[java.util.Collection[Any]].asScala
        new GenericArrayData(xs.map(toCatalyst(_, s.getElementType)).toArray)
      case Schema.Type.MAP =>
        val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala
        ArrayBasedMapData(m.map { case (k, mv) =>
          UTF8String.fromString(k match { case u: Utf8 => u.toString; case o => o.toString }) ->
            toCatalyst(mv, s.getValueType)
        })
      case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
    }
  }
}

/** Catalyst expression decoding Avro binary into a struct — our
  * stand-in for spark-avro's `from_avro` (F7, used at
  * ingest_raw.scala:144 / ingest.scala:162; the spark-avro module jar
  * is not shipped in this environment, so the expression is built
  * directly on avro-1.12).
  *
  * Schema resolution is writer→reader via Avro's own
  * GenericDatumReader, so reader-side defaulted fields (v2's
  * size/color) fill in when decoding v1 payloads with a v2 reader.
  * `permissive=true` ≙ mode=PERMISSIVE (corrupt → null,
  * ingest_raw.scala:125-126); false ≙ FAILFAST (ingest.scala:128-131).
  *
  * CodegenFallback is deliberate: decode cost is dominated by Avro
  * itself; the expression is the per-batch leaf and everything
  * downstream (flatten, filters, aggs) stays in whole-stage codegen.
  */
case class AvroDecode(
    child: Expression,
    writerSchemaJson: String,
    readerSchemaJson: String,
    permissive: Boolean)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val writerSchema = new Schema.Parser().parse(writerSchemaJson)
  @transient private lazy val readerSchema = new Schema.Parser().parse(readerSchemaJson)
  @transient private lazy val datumReader =
    new GenericDatumReader[GenericRecord](writerSchema, readerSchema)

  override lazy val dataType: DataType = AvroCatalyst.toSqlType(
    new Schema.Parser().parse(readerSchemaJson))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
      val record = datumReader.read(null, decoder)
      AvroCatalyst.toCatalyst(record, readerSchema)
    } catch {
      case NonFatal(e) => if (permissive) null else throw e
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)
}

object AvroDecode {
  /** DataFrame-facing sugar: graft's `from_avro`. */
  def fromAvro(col: Column, writerJson: String, readerJson: String,
               permissive: Boolean = false): Column =
    GraftColumnBridge.column(
      AvroDecode(GraftColumnBridge.expression(col), writerJson, readerJson, permissive))

  def fromAvro(col: Column, schemaJson: String): Column =
    fromAvro(col, schemaJson, schemaJson)
}

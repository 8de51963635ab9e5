package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._

import graft.codec.AvroBinary

/** Catalyst expression encoding a struct column to Avro binary — the
  * `to_avro` stand-in (SNK5's idiomatic Kafka-producer mapping,
  * SURVEY.md §2.2: `to_avro(struct(*)) AS value`), inverse of
  * [[AvroDecode]]. Field mapping is by schema field order against the
  * struct's fields by name.
  */
case class AvroEncode(child: Expression, schemaJson: String)
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  private def toAvro(v: Any, s: Schema, t: DataType): Any = {
    if (v == null) return null
    (s.getType, t) match {
      case (Schema.Type.UNION, _) =>
        val branch = s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
        toAvro(v, branch, t)
      case (Schema.Type.STRING | Schema.Type.ENUM, _) => v.toString
      case (Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
            Schema.Type.DOUBLE | Schema.Type.BOOLEAN, _) => v
      case (Schema.Type.BYTES, _) => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (Schema.Type.RECORD, st: StructType) =>
        val row = v.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.foreach { f =>
          val i = st.fieldIndex(f.name())
          val fv = if (row.isNullAt(i)) null else row.get(i, st(i).dataType)
          rec.put(f.pos(), toAvro(fv, f.schema(), st(i).dataType))
        }
        rec
      case (Schema.Type.ARRAY, at: ArrayType) =>
        val arr = v.asInstanceOf[ArrayData]
        val out = new java.util.ArrayList[Any](arr.numElements())
        (0 until arr.numElements()).foreach { i =>
          val e = if (arr.isNullAt(i)) null else arr.get(i, at.elementType)
          out.add(toAvro(e, s.getElementType, at.elementType))
        }
        out
      case (Schema.Type.MAP, mt: MapType) =>
        val m = v.asInstanceOf[MapData]
        val out = new java.util.HashMap[String, Any](m.numElements())
        val keys = m.keyArray(); val vals = m.valueArray()
        (0 until m.numElements()).foreach { i =>
          val mv = if (vals.isNullAt(i)) null else vals.get(i, mt.valueType)
          out.put(keys.getUTF8String(i).toString, toAvro(mv, s.getValueType, mt.valueType))
        }
        out
      case other => throw new IllegalArgumentException(s"unsupported Avro encode target $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val record = toAvro(input, schema, structType).asInstanceOf[GenericRecord]
    AvroBinary.encode(record, schema)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroEncode =
    copy(child = newChild)
}

object AvroEncode {
  /** DataFrame-facing sugar: graft's `to_avro`. */
  def toAvro(col: Column, schemaJson: String): Column =
    GraftColumnBridge.column(AvroEncode(GraftColumnBridge.expression(col), schemaJson))
}

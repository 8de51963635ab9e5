package graft.codec

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.UUID

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The two registry wire formats the reference ingests, plus plain
  * Avro binary encode/decode.
  *
  * - Confluent: 1 magic byte 0x00 | int32 schema id (big-endian) |
  *   Avro payload (ingest_raw.scala:70-74; header stripped with
  *   substring at :99-100).
  * - Glue: 1 header-version byte | 1 compression byte | 16-byte
  *   schema-version UUID | Avro payload (ingest.scala:33-45,
  *   headerSize = 18, split at :62-63).
  *
  * Each format exposes BOTH a byte-level codec (producer side, tests)
  * and Column-level extractors (ingest side) so the DataFrame path
  * never leaves codegen'd builtins — except the deliberate
  * `binaryToInt` UDF, kept because the reference's one UDF is exactly
  * this (ingest_raw.scala:74).
  */
sealed trait WireFormat extends Serializable {
  def headerSize: Int
  /** Column extractor: the bytes identifying the writer schema. */
  def schemaKeyCol(value: Column): Column
  /** Column extractor: the Avro payload bytes after the header. */
  def payloadCol(value: Column): Column
}

object ConfluentWire extends WireFormat {
  val Magic: Byte = 0x00
  override val headerSize = 5

  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(5 + payload.length)
      .put(Magic).putInt(schemaId).put(payload).array()

  def unframe(value: Array[Byte]): (Int, Array[Byte]) = {
    require(value.length >= headerSize && value(0) == Magic, "bad Confluent framing")
    val bb = ByteBuffer.wrap(value, 1, 4)
    (bb.getInt, java.util.Arrays.copyOfRange(value, headerSize, value.length))
  }

  /** The 4 schema-id bytes — substring(value, 2, 4) (ingest_raw.scala:100). */
  override def schemaKeyCol(value: Column): Column = substring(value, 2, 4)

  /** Payload — substring(value, 6, length(value)-5) (ingest_raw.scala:99). */
  override def payloadCol(value: Column): Column =
    value.substr(lit(headerSize + 1), length(value) - lit(headerSize))

  /** Big-endian bytes → int schema id; the reference's single UDF
    * (binaryToInt, ingest_raw.scala:74).
    */
  val binaryToInt = udf((bytes: Array[Byte]) => ByteBuffer.wrap(bytes).getInt)

  def schemaIdCol(value: Column): Column = binaryToInt(schemaKeyCol(value))
}

object GlueWire extends WireFormat {
  val HeaderVersion: Byte = 3
  val NoCompression: Byte = 0
  override val headerSize = 18 // 1 + 1 + 16 (ingest.scala:43-45)

  def frame(versionUuid: UUID, payload: Array[Byte]): Array[Byte] =
    ByteBuffer.allocate(headerSize + payload.length)
      .put(HeaderVersion).put(NoCompression)
      .putLong(versionUuid.getMostSignificantBits)
      .putLong(versionUuid.getLeastSignificantBits)
      .put(payload).array()

  def unframe(value: Array[Byte]): (UUID, Array[Byte]) = {
    require(value.length >= headerSize && value(0) == HeaderVersion, "bad Glue framing")
    val bb = ByteBuffer.wrap(value, 2, 16)
    val uuid = new UUID(bb.getLong, bb.getLong)
    (uuid, java.util.Arrays.copyOfRange(value, headerSize, value.length))
  }

  /** The whole 18-byte header, used as the demux grouping key exactly
    * as ingest.scala:62 does (it groups on raw header bytes, not the
    * parsed UUID).
    */
  override def schemaKeyCol(value: Column): Column = substring(value, 1, headerSize)

  override def payloadCol(value: Column): Column =
    value.substr(lit(headerSize + 1), length(value) - lit(headerSize))

  def uuidOf(header: Array[Byte]): UUID = {
    val bb = ByteBuffer.wrap(header, 2, 16)
    new UUID(bb.getLong, bb.getLong)
  }
}

/** Plain Avro binary (no framing) encode/decode for GenericRecords. */
object AvroBinary {
  def encode(record: GenericRecord, schema: Schema): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(record, encoder)
    encoder.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte], writer: Schema, reader: Schema): GenericRecord = {
    val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
    new GenericDatumReader[GenericRecord](writer, reader).read(null, decoder)
  }
}

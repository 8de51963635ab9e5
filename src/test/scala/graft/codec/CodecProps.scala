package graft.codec

import java.util.UUID

import org.apache.avro.generic.GenericData
import org.scalacheck.{Gen, Prop, Properties}

import graft.schema.ProductSchemas

/** Property-based round-trip laws for the wire codecs (SURVEY.md §5.2:
  * encode∘decode = id). Pure JVM — no Spark session per case.
  */
object CodecProps extends Properties("codec") {

  private val genPayload: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  private val genEvent: Gen[(String, String, String, Long, Option[(String, String)])] =
    for {
      pid <- Gen.identifier.suchThat(_.nonEmpty)
      eid <- Gen.uuid.map(_.toString)
      tpe <- Gen.oneOf(ProductSchemas.types)
      ts <- Gen.choose(0L, 4102444800L)
      v2 <- Gen.option(for {
        size <- Gen.oneOf(ProductSchemas.sizes)
        color <- Gen.oneOf(ProductSchemas.colors)
      } yield (size, color))
    } yield (pid, eid, tpe, ts, v2)

  property("confluent framing round-trips any id/payload") =
    Prop.forAll(Gen.choose(0, Int.MaxValue), genPayload) { (id, payload) =>
      val (id2, p2) = ConfluentWire.unframe(ConfluentWire.frame(id, payload))
      id2 == id && p2.sameElements(payload)
    }

  property("glue framing round-trips any uuid/payload") =
    Prop.forAll(Gen.uuid, genPayload) { (uuid, payload) =>
      val (u2, p2) = GlueWire.unframe(GlueWire.frame(uuid, payload))
      u2 == uuid && p2.sameElements(payload)
    }

  property("avro binary encode∘decode = id for both schema versions") =
    Prop.forAll(genEvent) { case (pid, eid, tpe, ts, v2) =>
      val schema = if (v2.isDefined) ProductSchemas.v2 else ProductSchemas.v1
      val rec = new GenericData.Record(schema)
      rec.put("productId", pid); rec.put("eventId", eid)
      rec.put("type", tpe); rec.put("timestamp", ts)
      v2.foreach { case (size, color) => rec.put("size", size); rec.put("color", color) }
      val back = AvroBinary.decode(AvroBinary.encode(rec, schema), schema, schema)
      back.get("productId").toString == pid &&
        back.get("eventId").toString == eid &&
        back.get("type").toString == tpe &&
        back.get("timestamp") == ts &&
        v2.forall { case (size, color) =>
          back.get("size").toString == size && back.get("color").toString == color
        }
    }

  property("v1 payload decoded with v2 reader gains defaults") =
    Prop.forAll(genEvent) { case (pid, eid, tpe, ts, _) =>
      val rec = new GenericData.Record(ProductSchemas.v1)
      rec.put("productId", pid); rec.put("eventId", eid)
      rec.put("type", tpe); rec.put("timestamp", ts)
      val back = AvroBinary.decode(
        AvroBinary.encode(rec, ProductSchemas.v1), ProductSchemas.v1, ProductSchemas.v2)
      back.get("size").toString == "none" && back.get("color").toString == "none"
    }
}

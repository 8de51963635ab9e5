package graft.sources

import java.io.ByteArrayInputStream

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based framing laws for the WARC reader/writer pair:
  * write∘parse = id over ARBITRARY byte payloads (not just UTF-8
  * text) and arbitrary record sequences — the parser must never rely
  * on payload content to find record boundaries (Content-Length is
  * the only authority).
  */
object WarcProps extends Properties("warc") {

  private val genPayload: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  private val genRecord: Gen[Warc.WarcRecord] = for {
    tpe <- Gen.oneOf("response", "conversion", "warcinfo", "metadata")
    id <- Gen.uuid.map(u => s"<urn:uuid:$u>")
    uri <- Gen.option(Gen.identifier.map(s => s"https://example.org/$s"))
    date <- Gen.option(Gen.const("2026-01-01T00:00:00Z"))
    ct <- Gen.option(Gen.oneOf("text/plain", "application/http", "application/octet-stream"))
    payload <- genPayload
  } yield Warc.WarcRecord(tpe, id, uri, date, ct, payload.length.toLong, payload)

  property("framing round-trips any record sequence with any byte payloads") =
    Prop.forAll(Gen.listOf(genRecord)) { recs =>
      val out = new java.io.ByteArrayOutputStream()
      recs.foreach(Warc.writeRecord(out, _))
      val back = Warc.records(new ByteArrayInputStream(out.toByteArray), "prop").toList
      back.length == recs.length && back.zip(recs).forall { case (b, r) =>
        b.warcType == r.warcType && b.recordId == r.recordId &&
          b.targetUri == r.targetUri && b.warcDate == r.warcDate &&
          b.contentType == r.contentType && b.contentLength == r.payload.length &&
          java.util.Arrays.equals(b.payload, r.payload)
      }
    }

  property("truncation inside the payload fails loudly, never silently returns") =
    Prop.forAll(genRecord.suchThat(_.payload.nonEmpty)) { r =>
      val out = new java.io.ByteArrayOutputStream()
      Warc.writeRecord(out, r)
      val bytes = out.toByteArray
      // cut past the 4-byte trailer INTO the payload (losing only
      // trailer bytes at EOF is tolerated framing padding; losing
      // payload must throw — Content-Length is the authority)
      val cut = java.util.Arrays.copyOf(bytes,
        bytes.length - 4 - r.payload.length.min(5))
      Prop.throws(classOf[IllegalStateException]) {
        Warc.records(new ByteArrayInputStream(cut), "prop").toList
      }
    }
}

package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.SparkTestBase
import graft.ext.WarcIngest

class WarcSpec extends SparkTestBase {

  private def rec(id: Long, text: String, tpe: String = "conversion") = {
    val p = text.getBytes(StandardCharsets.UTF_8)
    Warc.WarcRecord(tpe, s"<urn:uuid:doc-$id>",
      Some(s"https://example.org/src/$id"), Some("2026-01-01T00:00:00Z"),
      Some("text/plain"), p.length.toLong, p)
  }

  private def parseBytes(bytes: Array[Byte]): Seq[Warc.WarcRecord] =
    Warc.records(new ByteArrayInputStream(bytes), "test").toSeq

  test("framing round trip survives CRLF-laden, empty and multibyte payloads") {
    val recs = Seq(
      rec(1, "plain ascii"),
      // the record trailer sequence INSIDE a payload must not split it
      rec(2, "embedded\r\n\r\ntrailer and\nWARC/1.0\nversion line"),
      rec(3, ""),
      rec(4, "multißyte 日本語 text 😀"))
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach(Warc.writeRecord(out, _))
    val back = parseBytes(out.toByteArray)
    assert(back.map(_.recordId) == recs.map(_.recordId))
    back.zip(recs).foreach { case (b, r) =>
      assert(b.warcType == r.warcType && b.targetUri == r.targetUri)
      assert(b.contentLength == r.payload.length)
      assert(java.util.Arrays.equals(b.payload, r.payload))
    }
  }

  test("member-per-record gzip concatenation (the Common Crawl layout) decodes fully") {
    // each record its own gzip member, members concatenated — the
    // layout CC publishes so records are individually seekable
    val recs = (1L to 5L).map(i => rec(i, s"doc $i body"))
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val gz = new GZIPOutputStream(out)
      Warc.writeRecord(gz, r)
      gz.finish()
    }
    val back = parseBytes {
      val in = new java.util.zip.GZIPInputStream(
        new ByteArrayInputStream(out.toByteArray))
      val buf = new java.io.ByteArrayOutputStream()
      in.transferTo(buf); buf.toByteArray
    }
    assert(back.map(_.recordId) == recs.map(_.recordId))
  }

  test("truncation and misframing fail loudly with file context") {
    val out = new java.io.ByteArrayOutputStream()
    Warc.writeRecord(out, rec(1, "a payload that will be cut"))
    val whole = out.toByteArray
    val cut = java.util.Arrays.copyOf(whole, whole.length - 12)
    val e = intercept[IllegalStateException](parseBytes(cut))
    assert(e.getMessage.contains("test") && e.getMessage.contains("record #"))
    val junk = "HTTP/1.1 200 OK\r\n".getBytes(StandardCharsets.ISO_8859_1)
    val e2 = intercept[IllegalStateException](parseBytes(junk))
    assert(e2.getMessage.contains("version line"))
    val noLen = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Record-ID: <urn:uuid:x>\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1)
    val e3 = intercept[IllegalStateException](parseBytes(noLen))
    assert(e3.getMessage.contains("Content-Length"))
  }

  test("HTTP response payloads split into status and body as pure column exprs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nServer: x\r\n\r\n" +
      "<html>body with\r\n\r\nblank lines inside</html>"
    val redirect = "HTTP/1.0 301 Moved\r\nLocation: /new\r\n\r\n"
    val headless = "no http framing at all"
    val df = Seq(http, redirect, headless).map(_.getBytes(StandardCharsets.UTF_8))
      .toDF("payload")
      .select(Warc.httpStatus(col("payload")).as("status"),
        Warc.httpBody(col("payload")).as("body"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 200 &&
      rows(0).getString(1) == "<html>body with\r\n\r\nblank lines inside</html>",
      "body split must stop at the FIRST blank line only")
    assert(rows(1).getInt(0) == 301 && rows(1).getString(1) == "")
    assert(rows(2).isNullAt(0) || rows(2).getInt(0) == 0)
    assert(rows(2).getString(1) == "")
    // drift guard: the SQL-UDF surface equals the Scala composition
    graft.functions.GraftFunctions.registerSqlUdfs(spark)
    val viaSql = Seq(http, redirect, headless).map(_.getBytes(StandardCharsets.UTF_8))
      .toDF("payload")
      .selectExpr("graft_http_status(payload)", "graft_http_body(payload)")
      .collect()
    rows.zip(viaSql).foreach { case (a, b) =>
      assert((a.isNullAt(0) && b.isNullAt(0)) ||
        a.getInt(0) == b.getInt(0))
      assert(a.getString(1) == b.getString(1))
    }
  }

  test("httpHeader reads the header block only, case-insensitively, and never the body") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val payloads = Seq(
      // mixed-case name, parameterized value, tab after the colon
      "HTTP/1.1 200 OK\r\ncOntent-Type:\ttext/plain; charset=utf-8\r\n\r\nbody",
      // a body line that LOOKS like the header must not be read
      "HTTP/1.0 200 OK\r\nServer: x\r\n\r\nContent-Type: spoofed/inside-body",
      // no CRLFCRLF terminator at all: no header block, NULL
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nbroken",
      // header absent
      "HTTP/1.1 204 No Content\r\nServer: y\r\n\r\n")
    val got = payloads.map(_.getBytes(StandardCharsets.UTF_8)).toDF("payload")
      .select(Warc.httpHeader(col("payload"), "Content-Type").as("ct"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) == "text/plain; charset=utf-8", s"got ${got(0)}")
    assert(got(1) == null, "a body line must never spoof a header")
    assert(got(2) == null, "an unterminated header block yields no headers")
    assert(got(3) == null)
  }

  test("HTTP split agrees with a reference model over 300 randomized responses (seeded)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    def rndCase(s: String) =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
    val names = Seq("Content-Type", "Server", "X-Crawl-Id", "Location")
    def genResponse(): String = {
      val status =
        if (rnd.nextInt(10) == 0) "NOT-HTTP-AT-ALL"
        else s"HTTP/1.${rnd.nextInt(2)} ${100 + rnd.nextInt(500)} Some Reason"
      val headers = names.filter(_ => rnd.nextBoolean()).map { n =>
        val pad = if (rnd.nextBoolean()) " " else "\t "
        s"${rndCase(n)}:$pad value-${rnd.nextInt(100)}" +
          (if (n == "Content-Type" && rnd.nextBoolean()) "; charset=utf-8" else "")
      }
      val body = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => "plain body " + rnd.nextInt(1000)
        case 2 => "spoof\r\nContent-Type: body/spoof\r\n\r\nmore" // header-shaped body
        case _ => "multi\r\n\r\nblank\r\n\r\nlines"
      }
      val terminator = if (rnd.nextInt(8) == 0) "" else "\r\n\r\n"
      (status +: headers).mkString("\r\n") + terminator + body
    }
    // plain-Scala reference model of the three column exprs
    def model(p: String): (Option[Int], String, Option[String]) = {
      val at = p.indexOf("\r\n\r\n")
      val body = if (at >= 0) p.substring(at + 4) else ""
      val head = if (at >= 0) p.substring(0, at) else ""
      val status = "^HTTP/[0-9.]+ ([0-9]{3})".r.findFirstMatchIn(p).map(_.group(1).toInt)
      val ct = "(?i)(?:^|\r\n)Content-Type:[ \t]*([^\r\n]*)".r
        .findFirstMatchIn(head).map(_.group(1).trim)
      (status, body, ct)
    }
    val cases = (1 to 300).map(_ => genResponse())
    val got = cases.map(_.getBytes(StandardCharsets.UTF_8)).toDF("payload")
      .select(Warc.httpStatus(col("payload")).as("st"),
        Warc.httpBody(col("payload")).as("body"),
        Warc.httpHeader(col("payload"), "Content-Type").as("ct"))
      .collect()
    cases.zip(got).foreach { case (p, r) =>
      val (st, body, ct) = model(p)
      assert((if (r.isNullAt(0)) None else Some(r.getInt(0))) == st, s"status of ${p.take(60)}")
      assert(r.getString(1) == body, s"body of ${p.take(60)}")
      assert((if (r.isNullAt(2)) None else Some(r.getString(2))) ==
        ct.filter(_.nonEmpty), s"content-type of ${p.take(60)}")
    }
  }

  test("streaming WARC source admits shards incrementally and restarts from the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("warc-stream")
    val out = tmpDir("warc-stream-out")
    val ckpt = tmpDir("warc-stream-ckpt")
    def runOnce(): Unit = {
      val q = Warc.readStream(spark, dir.toString, maxFilesPerTrigger = 1)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Warc.writeFile(dir.resolve("s0.warc"), (1L to 3L).map(i => rec(i, s"doc $i")))
    Warc.writeFile(dir.resolve("s1.warc.gz"), (4L to 5L).map(i => rec(i, s"doc $i")))
    runOnce()
    val ids1 = spark.read.parquet(out).select("record_id")
      .collect().map(_.getString(0)).sorted
    assert(ids1.toSeq == (1L to 5L).map(i => s"<urn:uuid:doc-$i>"))
    // one file per trigger ⇒ 2 committed batches
    assert(new java.io.File(s"$ckpt/commits").list().count(!_.startsWith(".")) == 2)
    // a NEW shard arrives; the restarted query parses ONLY it
    Warc.writeFile(dir.resolve("s2.warc"), Seq(rec(6L, "doc 6")))
    runOnce()
    val ids2 = spark.read.parquet(out).select("record_id")
      .collect().map(_.getString(0)).sorted
    assert(ids2.toSeq == (1L to 6L).map(i => s"<urn:uuid:doc-$i>"),
      "restart must append exactly the new shard's records, once")
  }

  test("distributed writeShards round-trips records, pins per-shard order by seq, and emits every byte executor-side") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hostile payloads: trailer sequences, version lines, multibyte,
    // empty — framing must come from Content-Length alone
    val texts = Map(
      1L -> "plain", 2L -> "embedded\r\n\r\ntrailer\nWARC/1.0\nline",
      3L -> "", 4L -> "multißyte 日本語 😀", 5L -> "tail")
    val dir = tmpDir("warc-dist")
    val in = texts.toSeq.toDF("id", "text")
      .select(
        // 3 shards, mixed layouts; shard 2 holds ONE record
        when($"id" <= 2, "d-0.warc").when($"id" <= 4, "d-1.warc.gz")
          .otherwise("d-2.warc").as("shard_file"),
        // seq DESCENDS in id so order-by-seq is visibly not order-by-id
        (lit(100L) - $"id").as("seq"),
        lit("conversion").as("warc_type"),
        concat(lit("<urn:uuid:doc-"), $"id", lit(">")).as("record_id"),
        concat(lit("https://example.org/src/"), $"id").as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit("text/plain").as("content_type"),
        encode($"text", "utf-8").as("payload"))
    Warc.writeShards(in, dir)
    val back = Warc.read(spark, dir).where($"warc_type" === "conversion")
      .select($"warc_file", $"record_id", $"content_length", $"payload").collect()
    assert(back.length == 5)
    back.foreach { r =>
      val id = r.getString(1).stripPrefix("<urn:uuid:doc-").stripSuffix(">").toLong
      val expect = texts(id).getBytes(StandardCharsets.UTF_8)
      assert(r.getLong(2) == expect.length)
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](3), expect))
    }
    // per-shard record order == seq order (ids 1,2 share shard 0 with
    // seq 99,98 → file order must be 2 then 1)
    val shard0 = parseBytes(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "d-0.warc")))
    assert(shard0.map(_.warcType) == Seq("warcinfo", "conversion", "conversion"))
    assert(shard0.drop(1).map(_.recordId) ==
      Seq("<urn:uuid:doc-2>", "<urn:uuid:doc-1>"))
    // gz shard is really gzip, led by its warcinfo
    val gz = new java.util.zip.GZIPInputStream(java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(dir, "d-1.warc.gz")))
    val buf = new java.io.ByteArrayOutputStream(); gz.transferTo(buf)
    assert(parseBytes(buf.toByteArray).map(_.warcType) ==
      Seq("warcinfo", "conversion", "conversion"))
    // re-run is idempotent (whole-shard overwrite, deterministic bytes)
    Warc.writeShards(in, dir)
    assert(Warc.read(spark, dir).where($"warc_type" === "conversion").count() == 5)
  }

  test("writeShards round-trips 200 randomized records across random shard assignments (seeded)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(2026)
    // payloads over the full byte alphabet, arbitrary sizes incl. 0;
    // random shard fan-out with both layouts
    val recs = (1L to 200L).map { i =>
      val payload = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val shard = s"rt-${rnd.nextInt(7)}" + (if (rnd.nextBoolean()) ".warc.gz" else ".warc")
      (i, shard, payload)
    }
    val dir = tmpDir("warc-rand")
    val in = recs.toDF("id", "shard_file", "payload")
      .select(col("shard_file"), col("id").as("seq"),
        lit("resource").as("warc_type"),
        concat(lit("<urn:uuid:r-"), col("id"), lit(">")).as("record_id"),
        lit(null).cast("string").as("target_uri"),
        lit(null).cast("string").as("warc_date"),
        lit("application/octet-stream").as("content_type"),
        col("payload"))
    Warc.writeShards(in, dir)
    val back = Warc.read(spark, dir)
      .where(col("warc_type") === "resource")
      .select(col("record_id"), col("content_length"), col("payload"))
      .collect()
      .map(r => (r.getString(0).stripPrefix("<urn:uuid:r-").stripSuffix(">").toLong,
        r.getLong(1), r.getAs[Array[Byte]](2)))
    assert(back.length == recs.length)
    val expect = recs.map(r => r._1 -> r._3).toMap
    back.foreach { case (id, len, payload) =>
      assert(len == expect(id).length, s"record $id length")
      assert(java.util.Arrays.equals(payload, expect(id)), s"record $id bytes")
    }
    // absent optional headers round-trip as absent (null URI/date)
    val nulls = Warc.read(spark, dir).where(col("warc_type") === "resource")
      .where(col("target_uri").isNotNull || col("warc_date").isNotNull).count()
    assert(nulls == 0, "optional headers must not materialize from nulls")
  }

  test("writeShards gz shards carry one gzip member per record (the seekable WARC layout)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("warc-members")
    val in = (1L to 3L).map(i => (i, s"doc $i")).toDF("id", "text")
      .select(lit("m-0.warc.gz").as("shard_file"), $"id".as("seq"),
        lit("conversion").as("warc_type"),
        concat(lit("<urn:uuid:doc-"), $"id", lit(">")).as("record_id"),
        lit(null).cast("string").as("target_uri"),
        lit(null).cast("string").as("warc_date"),
        lit("text/plain").as("content_type"),
        encode($"text", "utf-8").as("payload"))
    Warc.writeShards(in, dir)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "m-0.warc.gz"))
    // GZIPOutputStream's fixed 10-byte header (magic, CM=8, FLG=0,
    // MTIME=0, XFL=0, OS=unknown) marks each member start; deflate
    // output can't reproduce it by chance at this size
    val header = Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte)
    val members = bytes.indices.count(i =>
      i + header.length <= bytes.length &&
        header.indices.forall(j => bytes(i + j) == header(j)))
    assert(members == 4, s"expected 4 gzip members (warcinfo + 3 records), got $members")
    // and the multi-member stream still decodes whole
    val gz = new java.util.zip.GZIPInputStream(new ByteArrayInputStream(bytes))
    val buf = new java.io.ByteArrayOutputStream(); gz.transferTo(buf)
    assert(parseBytes(buf.toByteArray).map(_.warcType) ==
      Seq("warcinfo", "conversion", "conversion", "conversion"))
  }

  test("writeShards re-run over existing output replaces each shard atomically, leaving no stale bytes or temps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def frame(tagged: String, n: Long) = (1L to n).toDF("id")
      .select(
        when($"id" % 2 === 0, "r-0.warc.gz").otherwise("r-1.warc").as("shard_file"),
        $"id".as("seq"),
        lit("conversion").as("warc_type"),
        concat(lit(s"<urn:uuid:$tagged-"), $"id", lit(">")).as("record_id"),
        concat(lit("https://example.org/src/"), $"id").as("target_uri"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        lit("text/plain").as("content_type"),
        encode(concat(lit(s"$tagged doc "), $"id"), "utf-8").as("payload"))
    val dir = tmpDir("warc-rerun")
    Warc.writeShards(frame("old", 6L), dir)
    // the re-run writes FEWER, DIFFERENT records into the same shard
    // names — the overwrite-rename must leave exactly the new content
    Warc.writeShards(frame("new", 4L), dir)
    val back = Warc.read(spark, dir).where($"warc_type" === "conversion")
      .select($"record_id", $"payload").collect()
      .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1),
        StandardCharsets.UTF_8)))
    assert(back.map(_._1).sorted.toSeq ==
      (1L to 4L).map(i => s"<urn:uuid:new-$i>"),
      s"stale records survived the re-run: ${back.map(_._1).sorted.toSeq}")
    back.foreach { case (id, text) =>
      assert(text.startsWith("new doc "), s"stale payload behind $id: $text")
    }
    // hidden files = Hadoop's local .crc sidecars; readers skip them
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.sorted.toSeq == Seq("r-0.warc.gz", "r-1.warc"),
      s"unexpected files after re-run: ${files.toSeq}")
  }

  test("writeShards task failure publishes nothing: committed shards survive, no partial or temp files appear") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = tmpDir("warc-abort")
    def frame(withPoison: Boolean) =
      (1L to 5L).map(i => (i, s"doc $i")).toDF("id", "text")
        .select(lit("f-0.warc").as("shard_file"), $"id".as("seq"),
          lit("conversion").as("warc_type"),
          concat(lit("<urn:uuid:doc-"), $"id", lit(">")).as("record_id"),
          lit(null).cast("string").as("target_uri"),
          lit(null).cast("string").as("warc_date"),
          lit("text/plain").as("content_type"),
          // the poison row's payload is NULL — the write task blows up
          // mid-shard, AFTER the temp file opened and 3 records landed
          (if (withPoison) when($"id" =!= 4L, encode($"text", "utf-8"))
           else encode($"text", "utf-8")).as("payload"))
    Warc.writeShards(frame(withPoison = false), dir)
    val before = Warc.read(spark, dir).count()
    assert(before == 6, s"5 records + warcinfo, got $before")
    intercept[Throwable](Warc.writeShards(frame(withPoison = true), dir))
    // the failed attempt must not have replaced or truncated the
    // committed shard, nor left any visible or hidden debris
    assert(Warc.read(spark, dir).count() == before,
      "failed write must leave the previously committed shard intact")
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      // the local ChecksumFileSystem's .crc sidecar of the committed
      // shard is Hadoop metadata, not debris
      .filterNot(n => n == "f-0.warc" || n == ".f-0.warc.crc")
    assert(leftovers.isEmpty, s"debris after failed write: ${leftovers.toSeq}")
  }

  test("q_warc_ingest reproduces the corpus from bytes alone, across plain and gz shards") {
    val dir = "/root/testdata/sf0.001"
    val got = WarcIngest.qWarcIngest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .collect().map { r =>
        val text = r.getAs[String]("text")
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        (r.getAs[Long]("doc_id"), r.getAs[String]("source"), bytes.length.toLong,
          org.apache.commons.codec.digest.DigestUtils.md5Hex(bytes))
      }.sortBy(_._1)
    assert(got.toSeq == docs.toSeq)
    // every shard contributed (both layouts actually exercised), and
    // each shard leads with a warcinfo record the query filtered out
    val raw = Warc.read(spark, WarcIngest.warcFixture(spark, dir))
    val files = raw.select("warc_file").distinct().collect().map(_.getString(0))
    assert(files.count(_.endsWith(".warc")) == 2 && files.count(_.endsWith(".gz")) == 2)
    import org.apache.spark.sql.functions.col
    assert(raw.where(col("warc_type") === "warcinfo").count() == 4)
  }
}

package graft.sources

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** WARC (ISO 28500) reader/writer — the wire format web-crawl
  * corpora actually arrive in (Common Crawl publishes ~90k WARC/WET
  * files per monthly crawl). A training-data pipeline's first stage
  * is exactly this: stream each archive file, split it into records,
  * surface (type, target URI, payload) as columns.
  *
  * Format recap (public spec): a record is a header block —
  * `WARC/1.0\r\n`, then `Name: value\r\n` lines, then a bare
  * `\r\n` — followed by exactly `Content-Length` payload bytes and a
  * `\r\n\r\n` trailer. Files may be plain `.warc` or `.warc.gz`
  * (concatenated per-record gzip members; `GZIPInputStream` walks
  * multi-member streams natively, so one decoder covers both the
  * whole-file and member-per-record layouts).
  *
  * Scale shape: WARC is NOT splittable mid-file, so the unit of
  * parallelism is the archive FILE — `binaryFiles` hands each task a
  * lazy [[org.apache.spark.input.PortableDataStream]] (never the
  * whole file as one array) and the record iterator streams off it
  * with bounded memory (one payload at a time). A 100 TB crawl is
  * ~100k files ≈ 100k tasks: exactly how warcio-based readers shard.
  * Parsing is strict — a truncated or misframed file fails loudly
  * with the file offset context rather than silently dropping tail
  * records.
  */
object Warc {

  /** One parsed record; `payload` is the raw Content-Length bytes. */
  case class WarcRecord(
      warcType: String,
      recordId: String,
      targetUri: Option[String],
      warcDate: Option[String],
      contentType: Option[String],
      contentLength: Long,
      payload: Array[Byte])

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Read every record of every `*.warc` / `*.warc.gz` under `path`
    * into a DataFrame with [[schema]]. File-granular parallelism;
    * per-file streaming decode.
    */
  def read(spark: SparkSession, path: String, minPartitions: Int = 0): DataFrame = {
    val files =
      if (minPartitions > 0) spark.sparkContext.binaryFiles(path, minPartitions)
      else spark.sparkContext.binaryFiles(path)
    val rows = files.flatMap { case (file, pds) =>
      val raw = pds.open()
      val in = if (file.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024) else raw
      records(in, file).map { r =>
        Row(file, r.warcType, r.recordId, r.targetUri.orNull, r.warcDate.orNull,
          r.contentType.orNull, r.contentLength, r.payload)
      }
      // the iterator closes `in` on exhaustion; flatMap drains it fully
    }
    spark.createDataFrame(rows, schema)
  }

  /** STREAMING WARC source — new crawl shards arrive, each micro-batch
    * parses only the newly-seen archive files (checkpointed file-
    * source admission, `maxFilesPerTrigger`-boundable): the
    * incremental front of a refresh pipeline. Built on the
    * `binaryFile` streaming source, which delivers each file's bytes
    * whole — so per-task memory is one shard (crawl shards are sized
    * ~1 GB by convention; the BATCH [[read]] path streams lazily via
    * PortableDataStream and has no such bound). Output schema matches
    * [[schema]].
    */
  def readStream(spark: SparkSession, path: String,
                 maxFilesPerTrigger: Int = 0): DataFrame = {
    import spark.implicits._
    val binSchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val r = spark.readStream.format("binaryFile").schema(binSchema)
    val files =
      (if (maxFilesPerTrigger > 0)
        r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r).load(path)
    files.select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        val raw = new java.io.ByteArrayInputStream(bytes)
        val in = if (file.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024) else raw
        records(in, file).map { r =>
          (file, r.warcType, r.recordId, r.targetUri, r.warcDate,
            r.contentType, r.contentLength, r.payload)
        }
      }
      .toDF("warc_file", "warc_type", "record_id", "target_uri",
        "warc_date", "content_type", "content_length", "payload")
  }

  /** Streaming record iterator over one archive stream. Closes `in`
    * when the stream is exhausted. Strict: any framing violation
    * throws with `context` and the record index.
    */
  def records(in: InputStream, context: String): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val bin = new BufferedInputStream(in, 64 * 1024)
      private var idx = 0
      private var nextRec: WarcRecord = _
      private var done = false

      private def fail(msg: String): Nothing =
        throw new IllegalStateException(s"WARC parse error in $context record #$idx: $msg")

      // header lines are ASCII per spec; ISO-8859-1 keeps bytes 1:1
      private def readLine(): Option[String] = {
        val sb = new java.lang.StringBuilder(96)
        var c = bin.read()
        if (c < 0) return None
        while (c >= 0 && c != '\n') { sb.append(c.toChar); c = bin.read() }
        var s = sb.toString
        if (s.nonEmpty && s.charAt(s.length - 1) == '\r') s = s.substring(0, s.length - 1)
        Some(s)
      }

      private def readFully(n: Long): Array[Byte] = {
        if (n > Int.MaxValue) fail(s"payload of $n bytes exceeds a single-record bound")
        val buf = new Array[Byte](n.toInt)
        var off = 0
        while (off < buf.length) {
          val k = bin.read(buf, off, buf.length - off)
          if (k < 0) fail(s"EOF inside a $n-byte payload at offset $off")
          off += k
        }
        buf
      }

      // a failed parse still releases the underlying file/gzip stream:
      // strict framing means the iterator is abandoned on error, so the
      // error path is the only close the stream would ever get
      private def advance(): Unit = try advance0() catch {
        case e: IllegalStateException => closeQuietly(); throw e
        // a corrupt gzip member / IO fault surfaces with file context,
        // not a bare ZLIB message from deep inside the decoder
        case e: java.io.IOException =>
          closeQuietly()
          throw new IllegalStateException(
            s"WARC stream error in $context record #$idx: ${e.getMessage}", e)
      }

      private def closeQuietly(): Unit =
        try bin.close() catch { case _: java.io.IOException => () }

      private def advance0(): Unit = {
        // tolerate blank padding between records, then expect a version line
        var line = readLine()
        while (line.contains("")) line = readLine()
        line match {
          case None => done = true; bin.close()
          case Some(v) if v.startsWith("WARC/") =>
            var headers = Map.empty[String, String]
            var h = readLine().getOrElse(fail("EOF in header block"))
            while (h.nonEmpty) {
              val i = h.indexOf(':')
              if (i < 0) fail(s"malformed header line '$h'")
              headers += h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
              h = readLine().getOrElse(fail("EOF in header block"))
            }
            val len = headers.getOrElse("content-length", fail("missing Content-Length"))
              .toLongOption.getOrElse(fail("non-numeric Content-Length"))
            val payload = readFully(len)
            // trailer: exactly two CRLFs
            (readLine(), readLine()) match {
              case (Some(""), Some("")) => ()
              case other => fail(s"bad record trailer $other")
            }
            nextRec = WarcRecord(
              headers.getOrElse("warc-type", fail("missing WARC-Type")),
              headers.getOrElse("warc-record-id", fail("missing WARC-Record-ID")),
              headers.get("warc-target-uri"),
              headers.get("warc-date"),
              headers.get("content-type"),
              len, payload)
            idx += 1
          case Some(v) => fail(s"expected WARC/ version line, got '$v'")
        }
      }

      override def hasNext: Boolean = {
        if (!done && nextRec == null) advance()
        !done && nextRec != null
      }
      // NoSuchElementException per the Iterator contract (an
      // IOException here would break generic combinators that probe
      // next() after hasNext=false); framing errors stay in advance()
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException(s"$context exhausted")
        val r = nextRec; nextRec = null; r
      }
    }

  /** HTTP split for `response` records, whose payload is the raw HTTP
    * response (status line + headers + CRLFCRLF + body) — pure column
    * expressions (codegen'd, no UDF): the numeric status code, and
    * the body after the first blank line. A payload with no header
    * terminator yields an empty body (strict crawls drop those).
    */
  def httpStatus(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val m = regexp_extract(payload.cast("string"), "^HTTP/[0-9.]+ ([0-9]{3})", 1)
    // no-match ⇒ NULL, not an ANSI cast failure on ''
    when(m =!= "", m.cast("int"))
  }

  /** Value of HTTP header `name` (case-insensitive) in a `response`
    * payload's header block — the block BEFORE the first CRLFCRLF, so
    * a body that happens to contain `Name:` lines can never spoof a
    * header. NULL when the header (or the block terminator) is
    * absent. Pure column expressions.
    */
  def httpHeader(payload: org.apache.spark.sql.Column,
                 name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val s = payload.cast("string")
    val at = locate("\r\n\r\n", s)
    val head = when(at > 0, s.substr(lit(1), at - 1)).otherwise(lit(""))
    val m = regexp_extract(head,
      "(?i)(?:^|\r\n)" + java.util.regex.Pattern.quote(name) + ":[ \t]*([^\r\n]*)", 1)
    when(m =!= "", trim(m))
  }

  def httpBody(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val s = payload.cast("string")
    val at = locate("\r\n\r\n", s)
    when(at > 0, s.substr(at + lit(4), length(s))).otherwise(lit(""))
  }

  /** Frame one record onto `out` (spec framing, CRLF line ends). */
  def writeRecord(out: OutputStream, r: WarcRecord): Unit = {
    val h = new java.lang.StringBuilder(256)
    def line(k: String, v: String): Unit = h.append(k).append(": ").append(v).append("\r\n")
    h.append("WARC/1.0\r\n")
    line("WARC-Type", r.warcType)
    line("WARC-Record-ID", r.recordId)
    r.targetUri.foreach(line("WARC-Target-URI", _))
    r.warcDate.foreach(line("WARC-Date", _))
    r.contentType.foreach(line("Content-Type", _))
    line("Content-Length", r.payload.length.toString)
    h.append("\r\n")
    out.write(h.toString.getBytes(StandardCharsets.ISO_8859_1))
    out.write(r.payload)
    out.write("\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
  }

  /** A gzip member that can be FINISHED without closing the
    * underlying stream — the building block of the WARC convention of
    * one gzip member PER RECORD (what makes records individually
    * seekable and is the layout Common Crawl publishes). `end()` also
    * releases the native Deflater immediately instead of waiting for
    * GC ([[java.util.zip.DeflaterOutputStream]]'s `def` field).
    */
  private final class MemberGzip(out: OutputStream) extends GZIPOutputStream(out) {
    def endMember(): Unit = { finish(); `def`.end() }
    // abandon a half-written member: release the native Deflater NOW
    // (end() is the only thing that frees it before GC finalization)
    def abortMember(): Unit = `def`.end()
  }

  /** Emit one record onto `raw`; for gzip layouts the record becomes
    * its OWN gzip member (header + trailer per record), so standard
    * WARC tooling can seek to member boundaries — the in-repo reader
    * walks multi-member streams natively either way. If framing
    * throws mid-member (e.g. a null payload), the member's native
    * Deflater is released immediately rather than leaking until GC.
    */
  private def emitRecord(raw: OutputStream, r: WarcRecord, gz: Boolean): Unit =
    if (!gz) writeRecord(raw, r)
    else {
      val m = new MemberGzip(raw)
      var ok = false
      try { writeRecord(m, r); m.endMember(); ok = true }
      finally if (!ok) m.abortMember()
    }

  /** Write `recs` as one archive file; gzip iff the name ends `.gz`
    * (one gzip member per record, the WARC convention). Driver-side
    * utility for single-archive fixtures; the distributed path is
    * [[writeShards]].
    */
  def writeFile(path: java.nio.file.Path, recs: Seq[WarcRecord]): Unit = {
    val fos = java.nio.file.Files.newOutputStream(path)
    val gz = path.toString.endsWith(".gz")
    try recs.foreach(emitRecord(fos, _, gz)) finally fos.close()
  }

  /** DISTRIBUTED WARC writer — the re-shard path of a real crawl
    * pipeline (ingest WARC, transform, EMIT WARC): every record of
    * `df` is framed from an EXECUTOR, never collected to the driver.
    *
    * Contract: `df` carries a `shard_file` column (the target archive
    * name — gzip iff it ends `.gz`), a `seq` column (LONG order of the
    * record within its shard; WARC is a sequential format, so shard
    * content order must be pinned by data, not by partition luck), and
    * the record columns `warc_type, record_id, target_uri, warc_date,
    * content_type, payload` (the [[schema]] names; `content_length` is
    * derived from the payload, never trusted from input).
    *
    * Plan shape: one hash repartition on `shard_file` (every shard's
    * records land in one task — the non-splittability of the format
    * makes the shard the atomic write unit) + an in-partition sort on
    * (shard_file, seq); each task then streams record-at-a-time onto
    * `fs.create`, so task memory is ONE payload regardless of shard
    * size, and a 100k-shard crawl writes as 100k-task-bucketed work
    * spread over the cluster. Each shard file also gets the spec's
    * leading `warcinfo` record, derived from its name; gzip shards
    * carry one gzip member PER RECORD (the WARC convention — standard
    * tooling expects member boundaries at record boundaries). Writes
    * go through the Hadoop FileSystem of `dir` (works on object
    * stores, not just local disk).
    *
    * Task-commit protocol: each shard streams into a task-attempt-
    * unique HIDDEN temp file (`.<shard>.<attempt>.inprogress` — dot
    * prefix, so both the batch and streaming readers' file listings
    * never admit it) and is RENAMED into place only when the shard's
    * last byte is down. So (a) a speculative or zombie duplicate
    * attempt can never interleave bytes with the winner — each writes
    * its own temp file, and whichever publishes last publishes
    * identical bytes (the write is deterministic given (df, dir));
    * (b) a task or job that dies mid-shard leaves no truncated shard
    * where a downstream glob would consume it — the temp is deleted
    * on the error path and invisible to readers regardless;
    * (c) a re-run over existing output replaces each shard in ONE
    * rename-with-overwrite (FileContext) — there is no delete-then-
    * rename window in which a crash destroys the previously published
    * shard while its replacement is still hidden.
    */
  def writeShards(df: DataFrame, dir: String, numTasks: Int = 0): Unit = {
    import org.apache.spark.sql.functions.{octet_length, struct}
    val spark = df.sparkSession
    // SerializableWritable is the PUBLIC conf-shipping wrapper
    // (util.SerializableConfiguration is private[spark])
    val hconf = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    base.getFileSystem(hconf.value).mkdirs(base)
    val baseStr = base.toString
    val cols = df.select(
      col("shard_file").cast("string"), col("seq").cast("long"),
      struct(col("warc_type"), col("record_id"), col("target_uri"),
        col("warc_date"), col("content_type"),
        octet_length(col("payload")).cast("long").as("content_length"),
        col("payload")).as("rec"))
    val parted =
      (if (numTasks > 0) cols.repartition(numTasks, col("shard_file"))
       else cols.repartition(col("shard_file")))
        .sortWithinPartitions(col("shard_file"), col("seq"))
    parted.foreachPartition { (rows: Iterator[Row]) =>
      val basePath = new org.apache.hadoop.fs.Path(baseStr)
      val fs = basePath.getFileSystem(hconf.value)
      // FileContext gives rename-with-OVERWRITE: a single atomic
      // replace of any previously published shard. The FileSystem
      // delete-then-rename alternative has a crash window between the
      // two calls that destroys the live shard while its replacement
      // is still a hidden temp — exactly Layout.replaceDir's hazard.
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        basePath.toUri, hconf.value)
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(tc => s"${tc.stageId()}-${tc.taskAttemptId()}").getOrElse("driver")
      var cur: String = null
      var out: OutputStream = null
      def tmpPath(shard: String) =
        new org.apache.hadoop.fs.Path(baseStr, s".$shard.$attempt.inprogress")
      // publish: close, then rename the complete temp into place
      def commitShard(): Unit = if (out != null) {
        val (o, shard) = (out, cur)
        out = null
        o.close()
        fc.rename(tmpPath(shard), new org.apache.hadoop.fs.Path(baseStr, shard),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
      // error path: best-effort close + drop the temp — never the
      // published file
      def abortShard(): Unit = if (out != null) {
        val (o, shard) = (out, cur)
        out = null
        try o.close() catch { case _: java.io.IOException => () }
        try fs.delete(tmpPath(shard), false)
        catch { case _: java.io.IOException => () }
      }
      try {
        rows.foreach { row =>
          val shard = row.getString(0)
          if (shard != cur) {
            commitShard()
            cur = shard
            out = fs.create(tmpPath(shard), true)
            // the spec's leading warcinfo record, named for the shard
            emitRecord(out, WarcRecord("warcinfo", s"<urn:uuid:info-$shard>",
              None, Some("2026-01-01T00:00:00Z"),
              Some("application/warc-fields"), 0L, Array.emptyByteArray),
              shard.endsWith(".gz"))
          }
          val r = row.getStruct(2)
          emitRecord(out, WarcRecord(
            r.getString(0), r.getString(1),
            Option(r.getString(2)), Option(r.getString(3)), Option(r.getString(4)),
            r.getLong(5), r.getAs[Array[Byte]](6)), cur.endsWith(".gz"))
        }
        commitShard()
      } catch { case e: Throwable => abortShard(); throw e }
    }
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * Image, audio AND video decode are REAL: PNG via `javax.imageio`,
  * WAV via `javax.sound.sampled` (both JDK built-ins), and MP4 via a
  * hand-written ISO BMFF box reader ([[JdkCodec.decodeMp4]]) — the JDK
  * has no video parser, so the fixture hand-frames a minimal
  * `ftyp`+`moov`(`mvhd`+`trak`/`tkhd`)+`mdat` container (the WAV
  * approach: RIFF is hand-written too) and the decoder walks the box
  * tree for timescale/duration and the tkhd 16.16 fixed-point
  * width/height. Only the mdat PAYLOAD (actual codec bitstream) is
  * synthetic — frame decode would need a real codec. The fixture
  * generates payloads whose ground-truth metadata is an arithmetic
  * function of doc_id, which is what lets the DuckDB oracle check the
  * decode round-trip: the outputs match only if the encoder AND
  * decoder actually speak the format.
  *
  * The per-row decode UDFs are the single-JVM analog of the
  * mapInPandas batch-decode a PySpark deployment uses: scan →
  * project(UDF), one stage, no shuffle, trivially partition-parallel.
  */
object Multimodal {

  /** (media_type, width, height, n_bytes, duration_ms) decoded meta. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("duration_ms", LongType)))

  /** Real JDK codecs (encode for the fixture, decode for the
    * operators): PNG, WAV, and a minimal-but-real MP4 container.
    */
  object JdkCodec extends Serializable {

    /** Solid-color PNG; every parameter is an arithmetic function of
      * the id so an oracle can predict the decoded metadata.
      */
    def makePng(id: Long): Array[Byte] = {
      val w = (16 + id % 17).toInt
      val h = (16 + (id * 3) % 13).toInt
      val rgb = (((id % 256) << 16) | (((id * 5) % 256) << 8) | ((id * 11) % 256)).toInt
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 8-bit mono 8 kHz PCM WAV with 800 + (id%32)·40 frames (always a
      * multiple of 8, so duration_ms = frames/8 is an exact integer).
      */
    def makeWav(id: Long): Array[Byte] = {
      val frames = (800 + (id % 32) * 40).toInt
      val data = Array.fill(frames)(128.toByte)
      val bb = java.nio.ByteBuffer.allocate(44 + frames)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + frames)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(8000).putInt(8000) // sample rate, byte rate
        .putShort(1).putShort(8) // block align, bits per sample
        .put("data".getBytes("US-ASCII")).putInt(frames)
        .put(data)
      bb.array()
    }

    /** Minimal REAL MP4 (ISO BMFF): `ftyp` + `moov`(`mvhd` +
      * `trak`/`tkhd`) + `mdat`. The movie header carries timescale
      * 1000 and duration 2000+(id%30)·100 (so duration units == ms,
      * exactly), the track header carries width/height as 16.16
      * fixed-point, and the mdat payload is the old deterministic
      * byte stream (16·(id%7+1) bytes). Every field a real demuxer
      * reads for stream metadata is present and spec-placed; only the
      * codec bitstream inside mdat is synthetic.
      */
    def makeMp4(id: Long): Array[Byte] = {
      val w = (320 + (id % 5) * 16).toInt
      val h = (180 + (id % 4) * 30).toInt
      val durMs = (2000 + (id % 30) * 100).toInt // timescale 1000 ⇒ units are ms
      def box(typ: String, payload: Array[Byte]): Array[Byte] = {
        val bb = java.nio.ByteBuffer.allocate(8 + payload.length) // big-endian
        bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
        bb.array()
      }
      val unityMatrix = { // 3×3 transform, 16.16/2.30 fixed-point identity
        val bb = java.nio.ByteBuffer.allocate(36)
        bb.putInt(0x10000).putInt(0).putInt(0)
          .putInt(0).putInt(0x10000).putInt(0)
          .putInt(0).putInt(0).putInt(0x40000000)
        bb.array()
      }
      val ftyp = box("ftyp", {
        val bb = java.nio.ByteBuffer.allocate(12)
        bb.put("isom".getBytes("US-ASCII")).putInt(0x200)
          .put("isom".getBytes("US-ASCII"))
        bb.array()
      })
      val mvhd = box("mvhd", {
        val bb = java.nio.ByteBuffer.allocate(100) // version-0 layout
        bb.putInt(0) // version + flags
          .putInt(0).putInt(0) // creation, modification
          .putInt(1000) // timescale
          .putInt(durMs) // duration (in timescale units)
          .putInt(0x00010000) // rate 1.0
          .putShort(0x0100.toShort) // volume 1.0
          .put(new Array[Byte](10)) // reserved
          .put(unityMatrix)
          .put(new Array[Byte](24)) // pre_defined
          .putInt(2) // next_track_ID
        bb.array()
      })
      val tkhd = box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84) // version-0 layout
        bb.putInt(0x000007) // version 0, flags enabled|in_movie|in_preview
          .putInt(0).putInt(0) // creation, modification
          .putInt(1) // track_ID
          .putInt(0) // reserved
          .putInt(durMs) // duration
          .put(new Array[Byte](8)) // reserved
          .putShort(0).putShort(0) // layer, alternate_group
          .putShort(0) // volume (0 for video tracks)
          .putShort(0) // reserved
          .put(unityMatrix)
          .putInt(w << 16).putInt(h << 16) // 16.16 fixed-point extent
        bb.array()
      })
      val moov = box("moov", mvhd ++ box("trak", tkhd))
      val mdat = box("mdat",
        Array.tabulate((16 * (id % 7 + 1)).toInt)(i => ((id * 31 + i) % 256).toByte))
      ftyp ++ moov ++ mdat
    }

    /** Real PNG decode: (width, height, red channel of pixel (0,0)). */
    def decodeImage(bytes: Array[Byte]): (Long, Long, Long) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (img.getWidth.toLong, img.getHeight.toLong, ((img.getRGB(0, 0) >> 16) & 0xff).toLong)
    }

    /** Real MP4 box-tree parse: (width, height, duration_ms).
      * Walks the top-level boxes to `moov`, reads timescale+duration
      * from `mvhd` (version-0 offsets 12/16) and the 16.16 fixed-point
      * width/height from the LAST 8 bytes of the first `trak`'s
      * `tkhd` — the spec-placed positions a real demuxer reads.
      * Malformed containers throw (loudly, like ImageIO on bad PNG);
      * 64-bit box sizes (size==1) are out of this minimal profile.
      */
    def decodeMp4(bytes: Array[Byte]): (Long, Long, Long) = {
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO BMFF is big-endian
      def findBox(start: Int, end: Int, typ: String): (Int, Int) = {
        var off = start
        while (off + 8 <= end) {
          val size = bb.getInt(off)
          if (size < 8) throw new java.io.IOException(
            s"malformed MP4: box size $size at offset $off")
          val t = new String(bytes, off + 4, 4, "US-ASCII")
          if (t == typ) return (off + 8, off + size)
          off += size
        }
        throw new java.io.IOException(s"malformed MP4: no '$typ' box in [$start,$end)")
      }
      val (moovS, moovE) = findBox(0, bytes.length, "moov")
      val (mvhdS, _) = findBox(moovS, moovE, "mvhd")
      val timescale = bb.getInt(mvhdS + 12) & 0xffffffffL
      val duration = bb.getInt(mvhdS + 16) & 0xffffffffL
      val (trakS, trakE) = findBox(moovS, moovE, "trak")
      val (_, tkhdE) = findBox(trakS, trakE, "tkhd")
      val w = (bb.getInt(tkhdE - 8) >>> 16).toLong
      val h = (bb.getInt(tkhdE - 4) >>> 16).toLong
      (w, h, math.round(duration * 1000.0 / timescale))
    }

    /** Real WAV header parse: exact duration in ms from frame count ÷
      * frame rate.
      */
    def decodeWavDurationMs(bytes: Array[Byte]): Long = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try math.round(in.getFrameLength * 1000.0 / in.getFormat.getFrameRate)
      finally in.close()
    }
  }

  /** Deterministic byte-level stand-ins for the transforms the JDK
    * cannot do natively (feature nets, scalers); a production
    * deployment swaps these for model/ffmpeg bindings — signatures
    * and batch shape stay identical.
    */
  object FakeCodec extends Serializable {
    /** Fake feature vector: dim doubles folded from the bytes. */
    def features(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      out
    }

    /** Stubbed resize: a real codec decodes, scales to (w,h) and
      * re-encodes; the stand-in samples the payload down/up to a byte
      * budget proportional to the target area — deterministic, size-
      * faithful, so downstream size accounting and schema are real.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, w * h / 64)
      val out = new Array[Byte](target)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < target) { out(i) = bytes((i.toLong * bytes.length / target).toInt); i += 1 }
      }
      out
    }
  }

  private val genUdf = udf { (id: Long, mediaType: String) =>
    mediaType match {
      case "image" => JdkCodec.makePng(id)
      case "audio" => JdkCodec.makeWav(id)
      case _       => JdkCodec.makeMp4(id)
    }
  }

  /** Synthesize a deterministic media-asset table from `documents`
    * (doc_id, media_type, media binary) — REAL PNG, WAV and MP4
    * containers whose ground-truth metadata is pure
    * doc_id arithmetic, so decode outputs are oracle-predictable.
    */
  def syntheticAssets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .withColumn("media", genUdf(col("doc_id"), col("media_type")))

  private val decodeUdf = udf { (mediaType: String, bytes: Array[Byte]) =>
    mediaType match {
      case "image" =>
        val (w, h, r) = JdkCodec.decodeImage(bytes)
        (w, h, r, 0L)
      case "audio" =>
        (0L, 0L, -1L, JdkCodec.decodeWavDurationMs(bytes))
      case _ =>
        val (w, h, d) = JdkCodec.decodeMp4(bytes)
        (w, h, -1L, d)
    }
  }

  private val featureUdf = udf { (bytes: Array[Byte]) => FakeCodec.features(bytes) }

  /** Decode: binary → typed metadata struct (real PNG/WAV/MP4 decode, see
    * [[JdkCodec]]; plan shape: scan → project(UDF), one stage, no
    * shuffle).
    */
  def withDecodedMeta(assets: DataFrame): DataFrame =
    assets
      .withColumn("d", decodeUdf(col("media_type"), col("media")))
      .select(col("doc_id"), col("media_type"), col("media"),
        struct(col("media_type"), col("d._1").as("width"), col("d._2").as("height"),
          col("d._3").as("px_r"), length(col("media")).cast("long").as("n_bytes"),
          col("d._4").as("duration_ms")).as("meta"))

  /** Feature extraction: binary → Array[Float] embedding column,
    * joinable with the ANN operators in [[Similarity]].
    */
  def withFeatures(assets: DataFrame): DataFrame =
    assets.withColumn("features", featureUdf(col("media")))

  private def resizeUdf(w: Int, h: Int) =
    udf { (bytes: Array[Byte]) => FakeCodec.resize(bytes, w, h) }

  /** Resize: binary → binary at a target resolution, plus the typed
    * meta struct for the new dimensions — same scan→project one-stage
    * shape as decode (stubbed scaler, real plumbing).
    */
  def withResized(assets: DataFrame, w: Int = 256, h: Int = 256): DataFrame =
    assets
      .withColumn("media_resized", resizeUdf(w, h)(col("media")))
      .withColumn("resized_meta", struct(
        lit(w).as("width"), lit(h).as("height"),
        length(col("media_resized")).cast("long").as("n_bytes")))

  /** Frame sampling for "video" payloads: split the byte stream into
    * fixed-size chunks and emit every k-th — the batch shape of a real
    * frame sampler (posexplode keeps frame index).
    */
  def sampleFrames(assets: DataFrame, chunkBytes: Int = 16, everyK: Int = 2): DataFrame =
    assets
      .where(col("media_type") === "video")
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, int(ceil(length(media) / $chunkBytes)) - 1),
           |  i -> substring(media, i * $chunkBytes + 1, $chunkBytes))""".stripMargin))
        .as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % everyK === 0)

  /** Cross-modal join: text documents with their embedding vectors
    * (doc_id = vec_id), aggregated per language — the join that ties
    * the text and vector pipelines together (scaled-integer centroid
    * of dim 1 keeps the oracle exact).
    */
  def qDocEmbedding(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .join(Tables.load(s, dir, "embeddings"),
        col("doc_id") === col("vec_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(floor(element_at(col("embedding"), 1).cast("double") * lit(1048576.0d)))
          .as("sum_dim1_scaled"))
      .orderBy(col("lang"))

  /** Decode round-trip over the synthetic asset table: per-doc decoded
    * metadata. The PNG/WAV/MP4 rows match the oracle's doc_id
    * arithmetic ONLY if `ImageIO`/`AudioSystem`/the BMFF box reader
    * really parsed the bytes the fixture encoded — this is the
    * correctness check of the decode operator itself, not of the
    * fixture.
    */
  def qMultimodalDecode(s: SparkSession, dir: String): DataFrame =
    withDecodedMeta(syntheticAssets(s, dir))
      .select(col("doc_id"), col("media_type"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.px_r").as("px_r"), col("meta.duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_doc_embedding" -> (qDocEmbedding _),
  )

  val oracle: Map[String, String] = Map(
    // ground truth is doc_id arithmetic by fixture construction; a
    // match proves the executors' ImageIO/AudioSystem/BMFF-box decode
    // was real
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS media_type,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 17
        |            WHEN doc_id % 3 = 2 THEN 320 + (doc_id % 5) * 16
        |            ELSE 0 END AS BIGINT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 3) % 13
        |            WHEN doc_id % 3 = 2 THEN 180 + (doc_id % 4) * 30
        |            ELSE 0 END AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 256 ELSE -1 END AS BIGINT) AS px_r,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 0
        |            WHEN doc_id % 3 = 1 THEN (800 + (doc_id % 32) * 40) // 8
        |            ELSE 2000 + (doc_id % 30) * 100 END AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_doc_embedding" ->
      """SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1048576.0) AS BIGINT)) AS BIGINT)
        |    AS sum_dim1_scaled
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The real decoders (JPEG/PNG, PCM, video containers) are STUBBED —
  * the media libraries are not in this container — behind
  * [[FakeCodec]], a deterministic byte-level fake. Everything
  * Spark-side is real and tested: schema, partition-friendly batch
  * shape, per-partition decode (one codec instance per partition, the
  * same shape a Pandas-UDF/mapInPandas pipeline has), and downstream
  * joins with the embedding/ANN operators.
  */
object Multimodal {

  /** (media_type, width, height, n_bytes, duration_ms) decoded meta. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("duration_ms", LongType)))

  /** Deterministic stand-in for a real media decoder. A production
    * deployment swaps this object for ImageIO/ffmpeg bindings (or
    * routes the binary column through mapInPandas on a PySpark
    * cluster); signatures and batch shape stay identical.
    */
  object FakeCodec extends Serializable {
    def decodeMeta(mediaType: String, bytes: Array[Byte]): (Int, Int, Long, Long) = {
      // ??? real decode unavailable in-container: derive deterministic
      // fake dimensions from the payload header instead
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val width = 64 + (b0 % 192) * 8
      val height = 64 + (b1 % 108) * 8
      val duration = if (mediaType == "image") 0L else 1000L + (bytes.length % 60) * 1000L
      (width, height, bytes.length.toLong, duration)
    }

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
      // ??? real scaler unavailable in-container
      val target = math.max(1, w * h / 64)
      val out = new Array[Byte](target)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < target) { out(i) = bytes((i.toLong * bytes.length / target).toInt); i += 1 }
      }
      out
    }
  }

  /** Synthesize a deterministic media-asset table from `documents`
    * (doc_id, media_type, media binary) — the test fixture for the
    * binary plumbing; payload bytes derive from the text.
    */
  def syntheticAssets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        // repeat the md5 bytes to get variable-length payloads
        to_binary(repeat(md5(col("text").cast("binary")), (col("doc_id") % 7 + 1).cast("int")),
          lit("hex")).as("media"))

  private val decodeUdf = udf { (mediaType: String, bytes: Array[Byte]) =>
    FakeCodec.decodeMeta(mediaType, bytes)
  }

  private val featureUdf = udf { (bytes: Array[Byte]) => FakeCodec.features(bytes) }

  /** Decode: binary → typed metadata struct (stubbed codec, real plan
    * shape: scan → project(UDF) stays one stage, no shuffle).
    */
  def withDecodedMeta(assets: DataFrame): DataFrame =
    assets
      .withColumn("d", decodeUdf(col("media_type"), col("media")))
      .select(col("doc_id"), col("media_type"), col("media"),
        struct(col("media_type"), col("d._1").as("width"), col("d._2").as("height"),
          col("d._3").as("n_bytes"), col("d._4").as("duration_ms")).as("meta"))

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

  /** Rows-only query: decode+measure the synthetic asset table. */
  def qMultimodalDecode(s: SparkSession, dir: String): DataFrame =
    withDecodedMeta(syntheticAssets(s, dir))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        avg(col("meta.width")).as("avg_width"))
      .orderBy(col("media_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_doc_embedding" -> (qDocEmbedding _),
  )

  val oracle: Map[String, String] = Map(
    // q_multimodal_decode stays rows-only (stubbed codec)
    "q_doc_embedding" ->
      """SELECT lang, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(CAST(embedding[1] AS DOUBLE) * 1048576.0) AS BIGINT)) AS BIGINT)
        |    AS sum_dim1_scaled
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |GROUP BY lang ORDER BY lang""".stripMargin,
  )
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("binary asset plumbing: synthesize, decode meta, extract features") {
    val assets = Multimodal.syntheticAssets(spark, dir)
    assert(assets.schema("media").dataType.typeName == "binary")

    val decoded = Multimodal.withDecodedMeta(assets)
    val row = decoded.orderBy("doc_id").first() // doc_id 0 -> 16x16 PNG
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getAs[Long]("width") == 16)
    assert(meta.getAs[Long]("n_bytes") > 0)

    // decode is deterministic: same input -> same meta
    val twice = Multimodal.withDecodedMeta(assets).select("doc_id", "meta.width")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val again = Multimodal.withDecodedMeta(assets).select("doc_id", "meta.width")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(twice == again)

    val feats = Multimodal.withFeatures(assets).select("features").first()
      .getSeq[Float](0)
    assert(feats.size == 16)
  }

  test("ImageIO/AudioSystem decode round-trips the fixture's ground truth per row") {
    val rows = Multimodal.qMultimodalDecode(spark, dir).collect()
    assert(rows.length > 0)
    var (nImg, nWav) = (0, 0)
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getString(1) match {
        case "image" =>
          nImg += 1
          assert(r.getLong(2) == 16 + id % 17, s"doc $id width")
          assert(r.getLong(3) == 16 + (id * 3) % 13, s"doc $id height")
          assert(r.getLong(4) == id % 256, s"doc $id red channel")
          assert(r.getLong(5) == 0L)
        case "audio" =>
          nWav += 1
          assert(r.getLong(5) == (800 + (id % 32) * 40) / 8, s"doc $id wav duration")
        case "video" =>
          assert(r.getLong(2) == 320 + (id % 5) * 16, s"doc $id mp4 width")
          assert(r.getLong(3) == 180 + (id % 4) * 30, s"doc $id mp4 height")
          assert(r.getLong(5) == 2000 + (id % 30) * 100, s"doc $id mp4 duration")
      }
    }
    assert(nImg > 0 && nWav > 0)
  }

  test("resize produces the target byte budget deterministically") {
    val assets = Multimodal.syntheticAssets(spark, dir)
    val r = Multimodal.withResized(assets, w = 128, h = 128)
    val lens = r.select(length(col("media_resized")).as("l")).distinct()
      .collect().map(_.getInt(0))
    assert(lens.toSet == Set(128 * 128 / 64))
    val metaW = r.select(col("resized_meta.width")).first().getInt(0)
    assert(metaW == 128)
    val a = r.orderBy("doc_id").select("media_resized").first().getAs[Array[Byte]](0)
    val b = Multimodal.withResized(assets, w = 128, h = 128)
      .orderBy("doc_id").select("media_resized").first().getAs[Array[Byte]](0)
    assert(a.sameElements(b))
  }

  test("frame sampling emits every k-th fixed-size chunk with index") {
    val assets = Multimodal.syntheticAssets(spark, dir)
    val frames = Multimodal.sampleFrames(assets, chunkBytes = 16, everyK = 2)
    assert(frames.count() > 0)
    assert(frames.where(col("frame_idx") % 2 =!= 0).count() == 0)
    val lens = frames.select(length(col("frame")).as("l")).distinct()
      .collect().map(_.getInt(0))
    assert(lens.forall(_ <= 16))
  }

  test("multimodal features join the ANN path") {
    val assets = Multimodal.withFeatures(Multimodal.syntheticAssets(spark, dir))
    val planes = Similarity.hyperplanes(4, 16)
    val bucketed = Similarity.withLshBucket(assets, "features", planes)
    assert(bucketed.select("bucket").distinct().count() > 1)
  }
}

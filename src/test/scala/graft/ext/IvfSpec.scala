package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

case class StreamVec(vec_id: Long, embedding: Array[Float])

class IvfSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("IVF assignment is a total deterministic partition of the vectors") {
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val centroids = IvfIndex.train(emb, "embedding", "vec_id", nCells = 8, dim = 64)
    val assigned = emb.withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
    assert(assigned.where(col("cell").isNull).count() == 0)
    assert(assigned.count() == emb.count())
    val again = emb.withColumn("cell", IvfIndex.assignCell(col("embedding"), centroids))
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val first = assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(first == again)
    // multiple cells actually used
    assert(assigned.select("cell").distinct().count() > 1)
  }

  test("IVF top-10 has decent recall vs brute force at nProbe=4/16") {
    val brute = Similarity.qCosineTopK(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = IvfIndex.annIvf(spark, dir, nProbe = 4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }

  test("exhaustive-probe IVF and LSH registry entries EQUAL the brute-force exact top-10") {
    val brute = Similarity.qCosineTopK(spark, dir).collect().map(_.toSeq).toSeq
    val ivf = IvfIndex.qAnnIvf(spark, dir).collect().map(_.toSeq).toSeq
    val lsh = Similarity.qAnnLsh(spark, dir).collect().map(_.toSeq).toSeq
    assert(brute.size == 10)
    assert(ivf == brute, "all-cells IVF must degenerate to exact top-k")
    assert(lsh == brute, "all-buckets LSH must degenerate to exact top-k")
  }

  test("pruned multi-probe LSH narrows the scan and recall grows with probe radius") {
    val total = graft.core.Tables.load(spark, dir, "embeddings").count()
    val planes = Similarity.hyperplanes(8, 64)
    val bucketed = Similarity.withLshBucket(
      graft.core.Tables.load(spark, dir, "embeddings"), "embedding", planes)
    val qBucket = bucketed.where(col("vec_id") === 0).select("bucket").first().getInt(0)
    val cand = Similarity.annCandidates(bucketed, qBucket, 8, probeRadius = 3).count()
    assert(cand < total, s"radius-3 probe scanned everything ($cand of $total)")
    val brute = Similarity.qCosineTopK(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recallAt(r: Int): Double = {
      val pruned = Similarity.annLsh(spark, dir, probeRadius = r)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (brute intersect pruned).size.toDouble / brute.size
    }
    // isotropic random vectors are sign-LSH's WORST case (top-10
    // cosines ~0.3-0.45 ⇒ per-plane split prob ~0.4) — the point of
    // the assert is the recall/scan-fraction TREND, not a production
    // recall figure, which this corpus cannot exhibit by construction
    val r1 = recallAt(1); val r3 = recallAt(3)
    assert(r3 >= r1, s"recall must not shrink as the probe radius grows: r1=$r1 r3=$r3")
    assert(r3 >= 0.3, s"LSH radius-3 recall too low: $r3")
  }

  test("appendStream maintains a cell-partitioned index incrementally with exactly-once bookkeeping") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 4-dim toy quantizer: cell 0 ≈ e1, cell 1 ≈ e2
    val centroids = Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))
    val target = tmpDir("ivf-index")
    val ckpt = tmpDir("ivf-index-ckpt")
    val stream = MemoryStream[StreamVec]
    def runOnce(): Unit = {
      val q = IvfIndex.appendStream(stream.toDF(), "embedding", centroids, target, ckpt)
      q.awaitTermination()
    }
    stream.addData(
      StreamVec(1L, Array(0.9f, 0.1f, 0f, 0f)),
      StreamVec(2L, Array(0.2f, 0.8f, 0f, 0f)))
    runOnce()
    // second incremental batch against the same checkpoint
    stream.addData(StreamVec(3L, Array(0.7f, 0.3f, 0f, 0f)))
    runOnce()
    val rows = spark.read.parquet(target)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toSeq
    // exactly-once: batch-1 rows are not re-appended by the re-run —
    // compare as a row multiset (a Map compare would silently collapse
    // re-appended duplicates and pass)
    assert(rows.sorted == Seq(1L -> 0, 2L -> 1, 3L -> 0), s"got $rows")
    // the layout is physically partitioned by cell...
    val dirs = new java.io.File(target).listFiles().map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.toSet == Set("cell=0", "cell=1"))
    // ...and a probe read prunes to the probed cell's directory
    val probe = spark.read.parquet(target).where($"cell" === 0)
    val scan = probe.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty, "cell predicate did not become a partition filter")
    assert(probe.count() == 2)
  }
}

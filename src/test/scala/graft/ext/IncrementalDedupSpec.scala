package graft.ext

import graft.SparkTestBase

/** Incremental near-dup mining: the persisted-index path must equal
  * the full-corpus exact miner restricted to pairs involving a new
  * document, and the index must behave like the ingest-time artifact
  * it models (built once, reused).
  */
class IncrementalDedupSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("incremental pairs equal the full-corpus miner restricted to new-involving pairs") {
    import org.apache.spark.sql.functions._
    val newIds = graft.core.Tables.load(spark, dir, "documents")
      .where(substring(col("source"), 4, 10).cast("int") >= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(newIds.nonEmpty, "fixture must contain a new batch")
    val full = TextAnalysis.qNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter { case (a, b, _, _) => newIds.contains(a) || newIds.contains(b) }
      .toSet
    val inc = IncrementalDedup.qIncrementalNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(inc == full, s"incremental=${inc.size} vs full-restricted=${full.size}")
    assert(inc.nonEmpty, "fixture must contain near-dup pairs involving new docs")
    // no old×old pair ever surfaces — that work is never redone
    inc.foreach { case (a, b, _, _) =>
      assert(newIds.contains(a) || newIds.contains(b), s"old×old pair ($a,$b)")
    }
  }

  test("the shingle index is a build-once session artifact") {
    val d1 = IncrementalDedup.persistedIndexDir(spark, dir)
    val d2 = IncrementalDedup.persistedIndexDir(spark, dir)
    assert(d1 == d2)
    assert(new java.io.File(d1, "index").exists())
    assert(new java.io.File(d1, "sets").exists())
    // the index holds ONLY the existing corpus's postings
    import org.apache.spark.sql.functions._
    val idxIds = spark.read.parquet(s"$d1/index")
      .select(shiftrightunsigned(col("m"), graft.functions.PairExpand.SzBits).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    val old = graft.core.Tables.load(spark, dir, "documents")
      .where(substring(col("source"), 4, 10).cast("int") < 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idxIds.nonEmpty && idxIds.subsetOf(old),
      "the persisted index must cover exactly the existing corpus")
  }
}

package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CorpusBuildSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("the artifact is deterministic, complete, decodable, and budget-packed") {
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val t1 = CorpusBuild.run(docs, tmpDir("cb1"))
    val t2 = CorpusBuild.run(docs, tmpDir("cb2"))
    val a = t1.read().collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList; case x => x
    }).sortBy(_.toString)
    val b = t2.read().collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList; case x => x
    }).sortBy(_.toString)
    assert(a.toSeq == b.toSeq, "same corpus + params must build byte-identical content")

    val rows = t1.read().cache()
    // completeness: exactly the curated survivors, once each
    val ids = rows.select("doc_id").collect().map(_.getLong(0))
    assert(ids.distinct.length == ids.length && ids.nonEmpty)
    val curated = Curation.curate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.toSet.subsetOf(curated), "only curated docs may survive")

    // decode: every token_id maps back to the doc's actual token
    val vocab = TextAnalysis.vocabOf(
        docs.join(rows.select("doc_id"), Seq("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").filter(_.nonEmpty)).toMap
    rows.select("doc_id", "token_ids").collect().take(50).foreach { r =>
      val toks = texts(r.getLong(0))
      val tids = r.getSeq[Long](1)
      assert(tids.length == toks.length)
      tids.zip(toks).foreach { case (tid, tok) =>
        if (tid >= 0) assert(vocab(tid) == tok)
      }
    }

    // packing: within (source, pack_id), in shuffle order, each pack
    // STARTS below the budget boundary (concatenate-and-cut: a doc
    // belongs to the pack its first token falls in)
    val budget = 256L
    rows.select("source", "shuffle_key", "doc_id", "n_tokens", "pack_id")
      .collect()
      .groupBy(_.getString(0)).foreach { case (_, rs) =>
        var cum = 0L
        rs.sortBy(r => (r.getString(1), r.getLong(2))).foreach { r =>
          assert(r.getLong(4) == cum / budget,
            s"doc ${r.getLong(2)} pack ${r.getLong(4)} != ${cum / budget}")
          cum += r.getLong(3)
        }
      }

    // manifest law: per source, pack ids are contiguous from 0 and
    // token mass is conserved across packs
    rows.groupBy(col("source"), col("pack_id"))
      .agg(sum(col("n_tokens")).as("nt"))
      .collect().groupBy(_.getString(0)).foreach { case (_, ps) =>
        val idsSeq = ps.map(_.getLong(1)).sorted
        assert(idsSeq.toSeq == (0L until idsSeq.length).toSeq, s"pack ids not contiguous: $idsSeq")
      }
    val packTotal = rows.groupBy(col("source")).agg(sum(col("n_tokens")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.select("source", "n_tokens").collect()
      .groupBy(_.getString(0)).foreach { case (src, rs) =>
        assert(rs.map(_.getLong(1)).sum == packTotal(src))
      }

    // the artifact is a REAL table: partitioned by source, versioned
    assert(t1.read().select("source").distinct().count() > 1)
    val v0 = t1.readAt(0)
    assert(v0.count() == rows.count(), "version 0 holds the full build")
    rows.unpersist()
  }
}

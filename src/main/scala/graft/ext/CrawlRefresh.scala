package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IndexCache, Tables, TxTable}
import graft.sources.Warc

/** The COMPOSED INCREMENTAL CRAWL REFRESH — every stage of "a new
  * crawl slice arrives, fold it into the training corpus" chained in
  * one graded job, each stage reusing the standalone operator's exact
  * semantics so the composition can never drift from the pieces:
  *
  *   1. the new batch (sources src10+, the [[ScaleOps.qBloomNewDocs]]
  *      split convention) enters FROM THE WIRE: parsed out of the
  *      session's WARC shards ([[graft.sources.Warc]]), not from the
  *      parquet mirror;
  *   2. the quality gate ([[Curation.curate]]'s token-count + stopword
  *      counters) drops junk BEFORE any pairwise work — at 100 TB the
  *      cheap map-side gate must run first so the dedup tier never
  *      fingerprints rejected bytes;
  *   3. near-dup rejection (exact Jaccard ≥ 1/2 over 3-shingles, the
  *      [[IncrementalDedup]] tier): a gated doc is rejected if it
  *      near-dups ANY existing-corpus doc (mined against the PERSISTED
  *      inverted index — old×old never recomputes) or any smaller-id
  *      gated doc of its own batch (the greedy drop-later-duplicates
  *      rule, deterministic and non-transitive by design);
  *   4. survivors MERGE into the ACID corpus table by doc_id
  *      ([[graft.core.TxTable.merge]] — idempotent under re-runs:
  *      re-merging admitted docs is an update to identical values);
  *   5. the output is the refreshed per-source corpus accounting plus
  *      one row per rejection bucket — the audit a production refresh
  *      publishes.
  *
  * Scale shape: gate is map-side; the new×old join drives the batch's
  * postings against the index (shuffle bounded by the batch, never
  * the corpus); within-batch pairs use the skew-capped sorted pair
  * expansion; the merge touches only admitted rows. Everything
  * downstream of the parse reuses ONE checkpointed disposition frame.
  */
object CrawlRefresh {

  private def srcNum = substring(col("source"), 4, 10).cast("int")

  /** The ACID corpus table seeded with the EXISTING corpus (src0-9),
    * built once per (session, dir) — the table the refresh merges
    * into and reads back.
    */
  private[graft] def corpusTable(s: SparkSession, dir: String): TxTable =
    IndexCache.memo(s"crawl-corpus:${s.sparkContext.applicationId}:$dir") {
      val tag = (dir + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]+", "_")
      val p = s"${sys.props("java.io.tmpdir")}/graft_crawlcorpus_$tag"
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
      val t = new TxTable(s, p)
      t.append(Tables.load(s, dir, "documents").where(srcNum < 10)
        .select(col("doc_id"), col("source"), col("text")))
      t
    }

  /** The quality-gate predicate ([[Curation.curate]]'s exact
    * counters) over a (doc_id, source, text) frame.
    */
  private def gateExpr: org.apache.spark.sql.Column = {
    val toks = TextAnalysis.tokens(col("text"))
    size(toks).cast("long").between(20L, 80L) &&
      size(filter(toks, t => t.isin(TextAnalysis.qualityStopwords: _*))) >= 1
  }

  /** Disposition of a gated batch against an existing-corpus postings
    * index `(h, m)`: the shared core of the batch [[qCrawlRefresh]]
    * and the streaming [[streamRefresh]]. Self-pairs (same doc id on
    * both sides) are excluded so a replayed streaming batch whose
    * postings already landed in the index cannot reject itself.
    */
  private def dispositions(gated: DataFrame, oldIdx: DataFrame): DataFrame = {
    val s = gated.sparkSession
    import s.implicits._
    import graft.functions.PairExpand
    val szMask = lit(PairExpand.SzMask)
    val sets = TextAnalysis.docShingleSets(gated.where(col("pass_gate")))
    val newIdx = sets
      .select(TextAnalysis.packedMember.as("m"), explode(col("hs")).as("h"))
      .localCheckpoint(eager = false)
    val rejectOld = newIdx.select($"h", $"m".as("mn"))
      .join(oldIdx.select($"h", $"m".as("mo")), "h")
      .where(shiftrightunsigned($"mn", PairExpand.SzBits) =!=
        shiftrightunsigned($"mo", PairExpand.SzBits))
      .groupBy($"mn", $"mo").agg(count(lit(1)).as("common"))
      .where(lit(3) * $"common" >=
        $"mn".bitwiseAND(szMask) + $"mo".bitwiseAND(szMask))
      .select(shiftrightunsigned($"mn", PairExpand.SzBits).as("doc_id"))
      .distinct()
    val rejectNew = newIdx
      .groupBy($"h").agg(array_sort(collect_list($"m")).as("ms"))
      .where(size($"ms") > 1)
      .select(explode(PairExpand($"ms")).as("p"))
      .groupBy($"p.a".as("pa"), $"p.b".as("pb")).agg(count(lit(1)).as("common"))
      .where(lit(3) * $"common" >=
        $"pa".bitwiseAND(szMask) + $"pb".bitwiseAND(szMask))
      .select(shiftrightunsigned($"pb", PairExpand.SzBits).as("doc_id"))
      .distinct()
    gated
      .join(rejectOld.withColumn("r_old", lit(true)), Seq("doc_id"), "left")
      .join(rejectNew.withColumn("r_new", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("text"),
        when(!col("pass_gate"), "_gate_rejected")
          .when(col("r_old"), "_neardup_old")
          .when(col("r_new"), "_neardup_new")
          .otherwise("_admitted").as("bucket"))
  }

  def qCrawlRefresh(s: SparkSession, dir: String): DataFrame = {
    // 1. the new batch, from the WARC bytes
    val parsed = Warc.read(s, WarcIngest.warcFixture(s, dir))
      .where(col("warc_type") === "conversion")
      .select(
        element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        element_at(split(col("target_uri"), "/"), -2).as("source"),
        col("payload").cast("string").as("text"))
      .where(srcNum >= 10)
    // 2. map-side quality gate (curate's exact counters)
    val gated = parsed
      .select(col("doc_id"), col("source"), col("text"), gateExpr.as("pass_gate"))
      .localCheckpoint(eager = false)
    // 3+audit. one disposition frame feeds the merge AND the audit
    val dispo = dispositions(gated, s.read.parquet(
        s"${IncrementalDedup.persistedIndexDir(s, dir)}/index"))
      .localCheckpoint(eager = false)
    // 4. idempotent merge of the survivors
    val t = corpusTable(s, dir)
    t.merge(dispo.where(col("bucket") === "_admitted")
      .select(col("doc_id"), col("source"), col("text")), Seq("doc_id"))
    // 5. refreshed per-source accounting + rejection audit
    val refreshed = t.read().groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("text")).cast("long")).as("sum_bytes"))
      .select(col("source").as("bucket"), col("n_docs"), col("sum_bytes"))
    val audit = dispo.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("bucket"), col("n_docs"), lit(null).cast("long").as("sum_bytes"))
    refreshed.unionAll(audit).orderBy(col("bucket"))
  }

  /** The STREAMING refresh — the same pipeline run continuously as
    * crawl slices arrive: each micro-batch of `(doc_id, source, text)`
    * docs is gated, dispositioned against the LIVE postings index,
    * its survivors merged into the corpus table, and the survivors'
    * postings appended to the index so LATER batches near-dup against
    * everything admitted so far (the index grows with the corpus —
    * the property the batch one-shot cannot give a continuous feed).
    *
    * Exactly-once: the corpus merge is idempotent by key (re-merging
    * identical rows is a no-op update) and the index append is a
    * (writerId, batchId) transactional [[TxTable.appendBatch]] — a
    * replayed batch re-merges harmlessly and its postings commit
    * once. [[dispositions]] excludes self-pairs, so a replay whose
    * postings already landed cannot reject its own documents; its
    * final corpus/index state is identical either way.
    *
    * Scale: per-trigger work is O(batch) — the gate is map-side, the
    * index join is bounded by the batch's postings, and the merge
    * touches only admitted rows.
    */
  def streamRefresh(docs: DataFrame, corpus: TxTable, index: TxTable,
                    checkpoint: String,
                    trainingArtifact: Option[(TxTable, DataFrame)] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("crawl-refresh")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gated = batch
          .select(col("doc_id"), col("source"), col("text"), gateExpr.as("pass_gate"))
          .localCheckpoint()
        val survivors = dispositions(gated, index.read())
          .where(col("bucket") === "_admitted")
          .select(col("doc_id"), col("source"), col("text"))
          .localCheckpoint()
        corpus.merge(survivors, Seq("doc_id"))
        index.appendBatch(
          TextAnalysis.docShingleSets(survivors)
            .select(explode(col("hs")).as("h"), TextAnalysis.packedMember.as("m")),
          "crawl-refresh-idx", batchId)
        // optional final stage: the admitted batch lands in the
        // TRAINING ARTIFACT too — frozen-vocab encode + per-source
        // pack continuation ([[CorpusBuild.appendIncrement]]),
        // (writerId, batchId)-transactional so replays append once
        trainingArtifact.foreach { case (artifact, vocab) =>
          CorpusBuild.appendIncrement(artifact, survivors, vocab,
            txn = Some(TxTable.TxnId("crawl-refresh-corpus", batchId)))
        }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_crawl_refresh" -> (qCrawlRefresh _))

  /** Oracle: the whole refresh recomputed from the parquet corpus —
    * gate mirrors Curation's counters, both near-dup tiers mirror the
    * IncrementalDedup pair SQL, the refreshed corpus is old ∪ admitted.
    */
  val oracle: Map[String, String] = Map(
    "q_crawl_refresh" ->
      s"""WITH newd AS (
         |  SELECT doc_id, source, text FROM documents
         |  WHERE CAST(substring(source, 4) AS INT) >= 10),
         |gt AS (
         |  SELECT doc_id, source, text,
         |    (len(list_filter(string_split(text, ' '), x -> x <> '')) BETWEEN 20 AND 80
         |     AND len(list_filter(string_split(text, ' '),
         |       x -> x IN ${TextAnalysis.stopwordsSql})) >= 1) AS pass_gate
         |  FROM newd),
         |tokn AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
         |  FROM gt WHERE pass_gate),
         |shn AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
         |  FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i FROM tokn WHERE len(t) >= 3)),
         |szn AS (SELECT doc_id, COUNT(*) AS sz FROM shn GROUP BY doc_id),
         |toko AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
         |  FROM documents WHERE CAST(substring(source, 4) AS INT) < 10),
         |sho AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i + 1 : i + 3], ' ') AS shingle
         |  FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i FROM toko WHERE len(t) >= 3)),
         |szo AS (SELECT doc_id, COUNT(*) AS sz FROM sho GROUP BY doc_id),
         |r_old AS (
         |  SELECT DISTINCT p.na AS doc_id
         |  FROM (SELECT a.doc_id AS na, b.doc_id AS ob, COUNT(*) AS c
         |        FROM shn a JOIN sho b ON a.shingle = b.shingle GROUP BY 1, 2) p
         |  JOIN szn sa ON p.na = sa.doc_id
         |  JOIN szo sb ON p.ob = sb.doc_id
         |  WHERE 3 * p.c >= sa.sz + sb.sz),
         |r_new AS (
         |  SELECT DISTINCT p.nb AS doc_id
         |  FROM (SELECT a.doc_id AS na, b.doc_id AS nb, COUNT(*) AS c
         |        FROM shn a JOIN shn b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |        GROUP BY 1, 2) p
         |  JOIN szn sa ON p.na = sa.doc_id
         |  JOIN szn sb ON p.nb = sb.doc_id
         |  WHERE 3 * p.c >= sa.sz + sb.sz),
         |dispo AS (
         |  SELECT doc_id, source, text,
         |    CASE WHEN NOT pass_gate THEN '_gate_rejected'
         |         WHEN doc_id IN (SELECT doc_id FROM r_old) THEN '_neardup_old'
         |         WHEN doc_id IN (SELECT doc_id FROM r_new) THEN '_neardup_new'
         |         ELSE '_admitted' END AS bucket
         |  FROM gt),
         |refreshed AS (
         |  SELECT source, text FROM documents WHERE CAST(substring(source, 4) AS INT) < 10
         |  UNION ALL
         |  SELECT source, text FROM dispo WHERE bucket = '_admitted')
         |SELECT source AS bucket, COUNT(*) AS n_docs,
         |  CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes
         |FROM refreshed GROUP BY source
         |UNION ALL
         |SELECT bucket, COUNT(*) AS n_docs, NULL AS sum_bytes
         |FROM dispo GROUP BY bucket
         |ORDER BY bucket""".stripMargin)
}

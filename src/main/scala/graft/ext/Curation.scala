package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The composed CURATION pass a training-data pipeline runs before
  * tokenization: language gate + quality gate + exact-dedup keeper,
  * in one job. Each stage reuses the standalone operator's exact
  * semantics (q_lang_id / q_text_quality / q_dedup_exact), so the
  * composition is oracle-checkable by joining their SQL mirrors.
  *
  * Scale shape: lang-id and the quality counters are pure map
  * expressions; the only data shuffle is the fingerprint window that
  * elects the keeper (hash partition on a 16-byte md5 — the same one
  * shuffle q_dedup_exact pays), and both window aggregates (keeper +
  * group size) share that single exchange. The WHOLE corpus crosses
  * it: the gates reference window outputs and non-key columns, so
  * they evaluate after the window — and must (keeper election has to
  * see gate-failing docs, or a filtered-out keeper would silently
  * promote its duplicate). To gate before electing keepers, filter
  * the input DataFrame instead — a different pipeline, not a plan
  * optimization.
  */
object Curation {

  /** Curated corpus: docs that (a) are their fingerprint group's
    * keeper (min doc_id per md5(trim(text)) — exact dedup), (b) have
    * `minTokens <= n_tokens <= maxTokens`, (c) contain at least
    * `minStopwords` stopword hits. Carries the per-doc evidence
    * (predicted language, counters, duplicate-group size).
    */
  def curate(docs: DataFrame,
             minTokens: Long = 20, maxTokens: Long = 80,
             minStopwords: Long = 1): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val w = Window.partitionBy(TextAnalysis.contentFingerprint(col("text")))
    LangTools.withLangId(docs)
      // both window aggregates in ONE select → one Window operator,
      // one exchange (chained withColumn planned two separate
      // Window+Exchange pairs: the recomputed md5 key defeats reuse)
      .select(col("doc_id"), col("lang_pred"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, t => t.isin(TextAnalysis.qualityStopwords: _*)))
          .cast("long").as("n_stopwords"),
        min(col("doc_id")).over(w).as("keeper_id"),
        count(lit(1)).over(w).cast("long").as("n_dupes"))
      .where(col("keeper_id") === col("doc_id") &&
        col("n_tokens").between(minTokens, maxTokens) &&
        col("n_stopwords") >= minStopwords)
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("n_stopwords"), col("n_dupes"))
  }

  def qCuration(s: SparkSession, dir: String): DataFrame =
    curate(Tables.load(s, dir, "documents")).orderBy(col("doc_id"))

  /** DSIR-shaped importance weighting ("Data Selection via Importance
    * Resampling", Xie et al. 2023): score every raw document by how
    * much its unigram distribution resembles a TARGET slice (here the
    * src0/src1 sources), then keep the top-N — the data-selection pass
    * that upsamples target-like documents before training. Per-token
    * weight is the add-one-smoothed count ratio
    * `(c_target + 1) / (c_raw + 1)`; a document's importance is the
    * sum of its tokens' weights. (The paper sums LOG ratios; a sum of
    * ratios keeps the same "target-like tokens score high" structure
    * while staying engine-exact — IEEE divide + decimal-cast sums —
    * where ln() differs across engines in final ULPs and would break
    * the oracle hash. The selection threshold is rank, not the
    * absolute score, so the substitution changes no contract.)
    *
    * Scale shape: one tokenize+explode pass feeds both the count
    * aggregate and the scoring join; the weight table is
    * O(vocabulary) and BROADCAST (at 100 TB vocab with hashed n-gram
    * features — the paper's 10k buckets — it stays broadcastable by
    * construction); the per-doc sum is the one data shuffle, and
    * top-N plans as TakeOrdered, never a global sort.
    */
  def qDsirWeights(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tk"))
    val weights = tok.groupBy(col("tk"))
      .agg(
        sum(when(col("source").isin("src0", "src1"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .select(col("tk"),
        ((col("ct") + lit(1.0d)) / (col("cr") + lit(1.0d)))
          .cast(DecimalType(18, 8)).as("w"))
    tok.join(broadcast(weights), "tk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("w")).cast("double").as("importance"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(50)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curation" -> (qCuration _),
    "q_dsir_weights" -> (qDsirWeights _),
  )

  /** Oracle: the three stage mirrors joined — lang-id CASE-chain
    * argmax, integer quality counters, min-doc_id-per-fingerprint
    * keeper election.
    */
  val oracle: Map[String, String] = Map(
    // add-one count-ratio weights summed per doc — all arithmetic is
    // IEEE divide + decimal-cast sums, exact in both engines
    "q_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tk
        |  FROM documents),
        |c AS (
        |  SELECT tk,
        |    CAST(SUM(CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END) AS BIGINT) AS ct,
        |    COUNT(*) AS cr
        |  FROM tok GROUP BY tk),
        |w AS (SELECT tk, CAST((ct + 1.0) / (cr + 1.0) AS DECIMAL(18,8)) AS w FROM c)
        |SELECT doc_id, COUNT(*) AS n_tokens, CAST(SUM(w) AS DOUBLE) AS importance
        |FROM tok JOIN w USING (tk)
        |GROUP BY doc_id ORDER BY importance DESC, doc_id LIMIT 50""".stripMargin,
    "q_curation" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, text,
         |    ${LangTools.langIdScoreColsSql}
         |  FROM t),
         |lid AS (
         |  SELECT doc_id, text,
         |    CASE ${LangTools.langIdCaseArmsSql}
         |      ELSE '${LangTools.langIdLangs.last}' END AS lang_pred
         |  FROM s),
         |q AS (
         |  SELECT doc_id, lang_pred,
         |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         |    len(list_filter(string_split(text, ' '),
         |      x -> x IN ${TextAnalysis.stopwordsSql})) AS n_stopwords
         |  FROM lid),
         |fp AS (SELECT doc_id, md5(trim(text)) AS f FROM documents),
         |grp AS (
         |  SELECT f, MIN(doc_id) AS keeper, COUNT(*) AS n_dupes
         |  FROM fp GROUP BY f)
         |SELECT q.doc_id, q.lang_pred, q.n_tokens, q.n_stopwords,
         |  CAST(grp.n_dupes AS BIGINT) AS n_dupes
         |FROM q JOIN fp ON q.doc_id = fp.doc_id
         |       JOIN grp ON fp.f = grp.f
         |WHERE grp.keeper = q.doc_id
         |  AND q.n_tokens BETWEEN 20 AND 80
         |  AND q.n_stopwords >= 1
         |ORDER BY q.doc_id""".stripMargin,
  )
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Language identification, BPE-ish token counting, and winnowing
  * document fingerprints — the text-pipeline operators beyond plain
  * tokenization.
  */
object LangTools {

  /** Tiny stopword profiles per language (public common-word lists).
    * Real deployments plug in fastText/CLD profiles; the operator
    * shape (score per language → argmax) is what matters at scale:
    * it's a single map-side pass, no shuffle.
    */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  /** Predict language by max stopword-profile hits (ties → first
    * alphabetically: argmax over (score, -alphabetical_rank)).
    */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val scored = profiles.toSeq.sortBy(_._1).zipWithIndex.map { case ((lang, words), i) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(-i).as("pref"), lit(lang).as("lang"))
    }
    df.withColumn("lang_best", array_max(array(scored: _*)))
      .withColumn("lang_pred", col("lang_best.lang"))
      .withColumn("lang_best_score", col("lang_best.score").cast("long"))
      .drop("lang_best")
  }

  /** BPE-ish subword-ish token count: words, numbers, and punctuation
    * runs counted separately (regexp-based approximation of a
    * tokenizer's pre-tokenization pass).
    */
  def withTokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_word_tokens",
        size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).cast("long"))
      .withColumn("n_num_tokens",
        size(expr(s"regexp_extract_all($textCol, '[0-9]+', 0)")).cast("long"))
      .withColumn("n_punct_tokens",
        size(expr(s"regexp_extract_all($textCol, '[^a-zA-Z0-9 ]', 0)")).cast("long"))

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03): md5 each
    * w-token shingle, keep the min digest of every window of `win`
    * consecutive shingles → a sparse, position-robust fingerprint set.
    *
    * Computed entirely MAP-SIDE by the native
    * [[graft.functions.WinnowFps]] expression (hash + window minima +
    * sorted distinct in one codegen'd loop) — zero shuffles where the
    * first cut paid a per-doc window exchange + sort AND a distinct
    * exchange. At 100 TB this is the difference between a free map
    * stage and reshuffling the whole exploded shingle index. See the
    * expression's Scaladoc for why this must NOT be a
    * transform/array_min lambda tower, and for the md5/byte-order
    * argument that keeps the recipe oracle-replicable.
    */
  def winnowFingerprints(docs: DataFrame, textCol: String = "text",
                         w: Int = 3, win: Int = 4,
                         carry: Seq[String] = Nil): DataFrame = {
    val carryCols = carry.map(col)
    docs
      .select(col("doc_id") +: carryCols :+ TextAnalysis.tokens(col(textCol)).as("toks"): _*)
      .where(size(col("toks")) >= w)
      .select(col("doc_id") +: carryCols :+
        explode(graft.functions.WinnowFps(col("toks"), w, win)).as("fp"): _*)
  }

  /** Train/eval DECONTAMINATION — the overlap check every LLM data
    * pipeline runs before training: which training documents share
    * enough winnowed fingerprints with an evaluation set to be
    * contamination? One fingerprint equi-join (the inverted
    * fingerprint index is the join key — never a doc×doc product)
    * followed by a pair aggregate with an integer threshold. At
    * 100 TB the eval side's fingerprint set is small enough to
    * broadcast — or to pre-filter the train side with a Bloom filter
    * ([[ScaleOps.bloomDedup]]'s shape) before the exact join.
    */
  def qDecontaminate(s: SparkSession, dir: String,
                     evalSource: String = "src0", minShared: Int = 2): DataFrame = {
    // fingerprinting is map-side (see winnowFingerprints), so each
    // branch's source filter pushes down to its parquet scan — two
    // pruned map scans beat one materialized checkpoint both here
    // and at 100 TB (where `source` is a partition column and the
    // eval branch reads ~nothing)
    val fps = winnowFingerprints(Tables.load(s, dir, "documents"), carry = Seq("source"))
    val ev = fps.where(col("source") === evalSource)
      .select(col("doc_id").as("eval_doc"), col("fp"))
    val tr = fps.where(col("source") =!= evalSource)
      .select(col("doc_id").as("train_doc"), col("fp"))
    tr.join(ev, "fp")
      .groupBy(col("train_doc"), col("eval_doc"))
      .agg(countDistinct(col("fp")).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .orderBy(col("train_doc"), col("eval_doc"))
  }

  /** Rows-only: predicted language + confidence per doc. */
  def qLangId(s: SparkSession, dir: String): DataFrame =
    withLangId(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("lang_pred"), col("lang_best_score"))
      .orderBy(col("doc_id"))

  /** Token-count stats per source (oracle-able: DuckDB has
    * regexp_extract_all with the same simple char-class patterns).
    */
  def qTokenCounts(s: SparkSession, dir: String): DataFrame =
    withTokenCounts(Tables.load(s, dir, "documents"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_word_tokens")).as("word_tokens"),
        sum(col("n_num_tokens")).as("num_tokens"),
        sum(col("n_punct_tokens")).as("punct_tokens"))
      .orderBy(col("source"))

  /** PII-style redaction pass: emails, long digit runs, and IPv4s
    * replaced with typed placeholder tags — the scrub stage every
    * training-data pipeline runs before tokenization. Pure
    * `regexp_replace` chain (codegen'd, map-side, no shuffle but the
    * output sort); redaction counts ride along as integers so the
    * oracle is byte-stable.
    */
  private[ext] val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private[ext] val IpRe = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  private[ext] val DigitsRe = "[0-9]{6,}"

  def withRedaction(df: DataFrame, textCol: String = "text"): DataFrame =
    // typed DSL, not expr(): SQL string literals would eat the regex
    // backslashes (Spark treats \b as an escape inside '...').
    // Counts are of TAGS in the final output, not raw-text matches —
    // the replacements run sequentially, so e.g. a digit run inside an
    // email is consumed by <EMAIL> and must not count as <NUM>.
    df.withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col(textCol),
          EmailRe, "<EMAIL>"), IpRe, "<IP>"), DigitsRe, "<NUM>"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("redacted"), lit("<EMAIL>"), lit(0))).cast("long"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("redacted"), lit("<IP>"), lit(0))).cast("long"))
      .withColumn("n_digit_runs",
        size(regexp_extract_all(col("redacted"), lit("<NUM>"), lit(0))).cast("long"))

  /** Redaction counts + scrubbed length per doc (oracle-checked; the
    * documents corpus has few true hits, so the interesting assertions
    * are in LangToolsSpec on synthetic PII).
    */
  def qRedact(s: SparkSession, dir: String): DataFrame =
    withRedaction(Tables.load(s, dir, "documents"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_digit_runs"),
        length(col("redacted")).cast("long").as("redacted_len"))
      .orderBy(col("doc_id"))

  /** Winnowing fingerprint count per doc (oracle-checked: md5 + the
    * same window-min recipe in SQL).
    */
  def qWinnowFingerprints(s: SparkSession, dir: String): DataFrame =
    winnowFingerprints(Tables.load(s, dir, "documents"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fingerprints"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lang_id" -> (qLangId _),
    "q_token_counts" -> (qTokenCounts _),
    "q_winnow_fingerprints" -> (qWinnowFingerprints _),
    "q_redact" -> (qRedact _),
    "q_decontaminate" -> ((s, d) => qDecontaminate(s, d)),
  )

  /** The oracle mirrors the argmax with the same tie-break (ties go
    * to the alphabetically-first language) as a CASE chain in
    * alphabetical order with >= comparisons.
    */
  private[ext] val langIdLangs: Seq[String] = profiles.keys.toSeq.sorted // de, en, es, fr, zh

  /** Per-language stopword-hit score columns over a `toks` list —
    * shared by the q_lang_id oracle and composed oracles (Curation).
    */
  private[ext] val langIdScoreColsSql: String =
    profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val list = words.map(w => s"'${w}'").mkString("(", ",", ")")
      s"len(list_filter(toks, x -> x IN $list)) AS $lang"
    }.mkString(",\n    ")

  /** The argmax CASE chain (ties → alphabetically-first language). */
  private[ext] val langIdCaseArmsSql: String =
    langIdLangs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langIdLangs.drop(i + 1)
      val cond = rest.map(o => s"$lang >= $o").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }.mkString("\n      ")

  private val langIdOracle: String = {
    val langs = langIdLangs
    val scoreCols = langIdScoreColsSql
    val caseArms = langIdCaseArmsSql
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    $scoreCols
       |  FROM t)
       |SELECT doc_id,
       |  CASE $caseArms ELSE '${langs.last}' END AS lang_pred,
       |  CAST(greatest(${langs.mkString(", ")}) AS BIGINT) AS lang_best_score
       |FROM s ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_lang_id" -> langIdOracle,
    "q_redact" ->
      s"""WITH r AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(text,
         |      '$EmailRe', '<EMAIL>', 'g'), '$IpRe', '<IP>', 'g'),
         |      '$DigitsRe', '<NUM>', 'g') AS redacted
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(redacted, '<EMAIL>')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(redacted, '<IP>')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(redacted, '<NUM>')) AS BIGINT) AS n_digit_runs,
         |  CAST(length(redacted) AS BIGINT) AS redacted_len
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, source, i AS pos, md5(array_to_string(t[i + 1 : i + 3], ' ')) AS h
        |  FROM (SELECT doc_id, source, t, unnest(range(len(t) - 2)) AS i
        |        FROM toks WHERE len(t) >= 3)),
        |fp AS (
        |  SELECT DISTINCT doc_id, source,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM sh),
        |ev AS (SELECT doc_id AS eval_doc, fp FROM fp WHERE source = 'src0'),
        |tr AS (SELECT doc_id AS train_doc, fp FROM fp WHERE source <> 'src0')
        |SELECT train_doc, eval_doc, COUNT(DISTINCT tr.fp) AS n_shared
        |FROM tr JOIN ev ON tr.fp = ev.fp
        |GROUP BY train_doc, eval_doc
        |HAVING COUNT(DISTINCT tr.fp) >= 2
        |ORDER BY train_doc, eval_doc""".stripMargin,
    "q_winnow_fingerprints" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(t[i + 1 : i + 3], ' ')) AS h
        |  FROM (SELECT doc_id, t, unnest(range(len(t) - 2)) AS i FROM toks WHERE len(t) >= 3)),
        |fp AS (
        |  SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |  FROM sh)
        |SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints
        |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_token_counts" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT) AS word_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[0-9]+'))) AS BIGINT) AS num_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))) AS BIGINT) AS punct_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
  )
}

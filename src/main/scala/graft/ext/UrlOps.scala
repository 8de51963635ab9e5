package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** URL CANONICALIZATION + frontier dedup — the first dedup any web
  * pipeline runs (before content hashing ever sees the bytes): crawl
  * frontiers and link graphs are keyed by a canonical URL, so scheme/
  * host case, default ports, fragments, tracking parameters and
  * trailing slashes must collapse. Rules implemented (the standard
  * RFC 3986 §6 safe normalizations plus the tracking-param scrub
  * every crawler adds):
  *
  *   - scheme and host lowercased; explicit default port dropped
  *     (`:443` for https, `:80` for http)
  *   - fragment dropped
  *   - query: `utm_*` / `gclid` / `fbclid` params removed, the rest
  *     SORTED (param order is non-semantic for dedup purposes), `?`
  *     dropped when nothing remains
  *   - trailing path slash trimmed (root `/` kept), empty path → `/`
  *
  * Everything is a composition of codegen'd built-ins (regexp
  * extraction, array filter/sort/join) — no UDF, whole-stage codegen
  * keeps it map-side; the dedup itself is one hash aggregate on the
  * canonical key. The same expressions in DuckDB are the oracle.
  */
object UrlOps {

  private val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  private def part(u: Column, group: Int): Column =
    regexp_extract(u, UrlRe, group)

  /** Canonical form of `url` per the rules above; pure Column expr. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(part(url, 1))
    val hostPort = lower(part(url, 2))
    // strip the scheme's default port only
    val h = when(scheme === "https" && hostPort.endsWith(":443"),
        substring_index(hostPort, ":", 1))
      .when(scheme === "http" && hostPort.endsWith(":80"),
        substring_index(hostPort, ":", 1))
      .otherwise(hostPort)
    val rawPath = part(url, 3)
    val path = when(length(rawPath) === 0, lit("/"))
      .when(rawPath === "/", lit("/"))
      .otherwise(rtrim(rawPath, "/"))
    val rawQ = part(url, 4) // includes the leading '?', or ''
    val kept = array_join(
      array_sort(filter(
        split(substr(rawQ, lit(2), length(rawQ)), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("gclid=") ||
          p.startsWith("fbclid=") || p === ""))),
      "&")
    val q = when(length(rawQ) === 0 || length(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), kept))
    concat(scheme, lit("://"), h, path, q)
  }

  /** Deterministic messy-URL synthesis over the documents table —
    * every doc_id deterministically picks case, default-port,
    * tracking-param, param-order, fragment and trailing-slash noise,
    * and doc_ids sharing `doc_id % 50` within a source share a page.
    */
  private def messyUrl: Column = {
    val page = col("doc_id") % 50
    val scheme = when(col("doc_id") % 2 === 0, "https").otherwise("HTTPS")
    val host = when(col("doc_id") % 3 === 0, "Example.COM").otherwise("example.com")
    val port = when(col("doc_id") % 5 === 0, ":443").otherwise("")
    val slash = when(col("doc_id") % 4 === 0, "/").otherwise("")
    val ref = concat(lit("ref="), (col("doc_id") % 10).cast("string"))
    val query = when(col("doc_id") % 6 === 0, concat(lit("?utm_source=x&"), ref))
      .when(col("doc_id") % 6 === 3, concat(lit("?"), ref, lit("&utm_campaign=y")))
      .otherwise(concat(lit("?"), ref))
    val frag = when(col("doc_id") % 3 === 1, "#frag").otherwise("")
    concat(scheme, lit("://"), host, port,
      lit("/"), col("source"), lit("/p"), page.cast("string"), slash, query, frag)
  }

  /** Frontier dedup: canonicalize the synthesized messy URLs, group,
    * keep the smallest doc_id per canonical URL, count the collapsed
    * variants. Output proves every normalization rule fired.
    */
  def qUrlCanon(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), canonicalizeUrl(messyUrl).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_variants"))
      .orderBy(col("canon_url"))

  /** Host of a canonical URL (post-[[canonicalizeUrl]]: lowercased,
    * default port stripped).
    */
  private def hostOf(canon: Column): Column =
    regexp_extract(canon, "^[a-z0-9+.-]+://([^/:?#]+)", 1)

  /** Varied-host messy-URL synthesis for the domain-level operators:
    * 21 hosts `h{d%7}.site{d%3}.org` with case noise the
    * canonicalization must erase before any host logic runs.
    */
  private def hostedUrl: Column = {
    val host = concat(lit("h"), (col("doc_id") % 7).cast("string"),
      lit(".site"), (col("doc_id") % 3).cast("string"), lit(".org"))
    concat(lit("https://"),
      when(col("doc_id") % 2 === 0, host).otherwise(upper(host)),
      lit("/"), col("source"), lit("/p"), (col("doc_id") % 50).cast("string"))
  }

  /** The blocklist — a parameter of the METHOD (a real pipeline loads
    * millions of rules); `site0.org` exercises the subdomain-suffix
    * match, `h3.site1.org` the exact-host match.
    */
  private[ext] val blockedDomains: Seq[String] = Seq("site0.org", "h3.site1.org")

  /** DOMAIN BLOCKLIST FILTER — the first gate every crawl pipeline
    * runs (robots/abuse/spam domain lists): a document is dropped
    * when its canonical host equals a blocked domain OR sits under it
    * (suffix match at label boundaries — blocking `site0.org` blocks
    * `a.site0.org`, never `notsite0.org`).
    *
    * Scale shape: each host explodes into its ≤ label-count DOMAIN
    * SUFFIXES (pure higher-order column math) and EQUI-joins the
    * blocklist — the form that scales to millions of rules (an
    * equi-join key, broadcastable or shuffled by the planner as the
    * list's size dictates), where a per-rule `endsWith` predicate
    * join would be a nested loop over the whole list per doc. Output
    * is the audit: one row per fired rule + `_kept`.
    */
  def qDomainBlocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), hostOf(canonicalizeUrl(hostedUrl)).as("host"))
    val labels = split(col("host"), "\\.")
    val suffixes = transform(sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
    val rules = blockedDomains.toDF("rule")
    val matched = docs
      .select(col("doc_id"), explode(suffixes).as("sfx"))
      .join(broadcast(rules), col("sfx") === col("rule"))
      .groupBy(col("doc_id")).agg(min(col("rule")).as("rule"))
    docs.join(matched, Seq("doc_id"), "left")
      .groupBy(coalesce(col("rule"), lit("_kept")).as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket"))
  }

  /** PER-HOST CAP (the FineWeb-style URL-level balance pass): keep at
    * most `cap` documents per canonical host — smallest doc_ids win,
    * deterministic — so no single domain dominates the corpus mix.
    * Output is the exact kept set (host, doc_id, rank), which pins
    * the election, not just the counts.
    *
    * Scale shape: the rank-within-host window's `rk <= cap` filter
    * plans as two-phase `WindowGroupLimit` — each map partition
    * forwards only its local top-`cap` per host, so a skewed hot host
    * costs O(cap) rows per partition across the exchange, never its
    * full document count.
    */
  def qHostCap(s: SparkSession, dir: String): DataFrame = {
    val cap = 3
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("doc_id"))
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), hostOf(canonicalizeUrl(hostedUrl)).as("host"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
      .select(col("host"), col("doc_id"), col("rk"))
      .orderBy(col("host"), col("rk"))
  }

  /** The robots-style rule table — a parameter of the METHOD (a real
    * pipeline loads per-host rule sets fetched from robots.txt):
    * (host, path prefix, allow?) with the standard LONGEST-MATCH-WINS
    * resolution and allow-beats-disallow on equal length (the
    * published Google/RFC 9309 tie rule). The set exercises every
    * behavior class: a whole-host disallow with a longer re-allow, a
    * stem disallow, a deep per-page disallow, and an allow override.
    */
  private[ext] val robotsRules: Seq[(String, String, Boolean)] = Seq(
    ("h1.site1.org", "/", false),
    ("h1.site1.org", "/src1", true),
    ("h2.site2.org", "/src", false),
    ("h0.site0.org", "/src1", false),
    ("h3.site0.org", "/src11/p2", false),
    ("h4.site1.org", "/src", false),
    ("h4.site1.org", "/src12", true))

  /** ROBOTS EXCLUSION FILTER — the compliance gate a crawl pipeline
    * runs before any fetch enters the corpus: per URL, the longest
    * matching (host, path-prefix) rule decides, allow winning ties
    * (RFC 9309 resolution). Output pins the per-doc election: the
    * winning rule and the verdict, NULL rule = no rule matched
    * (allowed by default).
    *
    * Scale shape: robots prefixes are STRING prefixes (not
    * segment-aligned), so each URL's path explodes into its character
    * prefixes BOUNDED by the longest rule (here ${"≤"}10 chars; a real
    * engine caps rule length the same way) and EQUI-joins the rule
    * table on (host, prefix) — broadcast or shuffle as the rule
    * list's size dictates, never a per-rule `startsWith` nested loop
    * over millions of rules. Resolution is one per-doc max_by on
    * (prefix length, allow) — map-side partials, no window.
    */
  def qRobotsFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rules = robotsRules.toDF("rhost", "rprefix", "allow")
    val maxLen = robotsRules.map(_._2.length).max
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        hostOf(canonicalizeUrl(hostedUrl)).as("host"),
        concat(lit("/"), col("source"), lit("/p"),
          (col("doc_id") % 50).cast("string")).as("path"))
    val prefixes =
      expr(s"transform(sequence(1, least(length(path), $maxLen)), i -> substr(path, 1, i))")
    val winner = docs
      .select(col("doc_id"), col("host"), explode(prefixes).as("prefix"))
      .join(broadcast(rules),
        col("host") === col("rhost") && col("prefix") === col("rprefix"))
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("rprefix").as("rule"), col("allow")),
        struct(length(col("rprefix")), col("allow"))).as("w"))
    docs.join(winner, Seq("doc_id"), "left")
      .select(col("doc_id"), col("host"), col("w.rule").as("rule"),
        when(col("w.allow").isNull || col("w.allow"), "allow")
          .otherwise("block").as("verdict"))
      .orderBy(col("doc_id"))
  }

  /** The LOADER-FACING host-cap row: per-host kept/dropped
    * accounting under the same cap-3 election as [[qHostCap]].
    * [[qHostCap]]'s exact kept set is the LAW (it pins the election
    * row by row) but is corpus-sized at 100 TB; this aggregate is
    * O(hosts) — the artifact a curation dashboard or loader actually
    * consumes at scale. One map-side-partial hash aggregate on the
    * canonical host; no window, no per-doc output.
    */
  def qHostCapStats(s: SparkSession, dir: String): DataFrame = {
    val cap = 3L
    Tables.load(s, dir, "documents")
      .select(hostOf(canonicalizeUrl(hostedUrl)).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_docs"))
      .select(col("host"), col("n_docs"),
        least(col("n_docs"), lit(cap)).as("n_kept"),
        (col("n_docs") - least(col("n_docs"), lit(cap))).as("n_dropped"))
      .orderBy(col("host"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_url_canon" -> (qUrlCanon _),
    "q_domain_blocklist" -> (qDomainBlocklist _),
    "q_host_cap" -> (qHostCap _),
    "q_host_cap_stats" -> (qHostCapStats _),
    "q_robots_filter" -> (qRobotsFilter _))

  /** The DuckDB mirror of [[canonicalizeUrl]], as a SELECT fragment:
    * given an input relation with a `url` column plus `carry` columns,
    * emits SQL computing `canon_url` alongside the carried columns.
    * ONE definition serves every oracle that canonicalizes (q_url_canon
    * and the crawl-refresh frontier), so the mirrors cannot diverge.
    */
  private[ext] def canonSelectSql(input: String, carry: Seq[String]): String = {
    val re = """^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\?[^#]*)?(#.*)?$"""
    val cs = carry.mkString(", ")
    s"""SELECT $cs,
       |    scheme || '://' ||
       |    (CASE WHEN scheme = 'https' AND hostport LIKE '%:443' THEN split_part(hostport, ':', 1)
       |          WHEN scheme = 'http' AND hostport LIKE '%:80' THEN split_part(hostport, ':', 1)
       |          ELSE hostport END) ||
       |    (CASE WHEN length(rawpath) = 0 OR rawpath = '/' THEN '/'
       |          ELSE rtrim(rawpath, '/') END) ||
       |    (CASE WHEN length(rawq) = 0 THEN '' ELSE
       |      (CASE WHEN length(kept) = 0 THEN '' ELSE '?' || kept END) END) AS canon_url
       |  FROM (
       |    SELECT *, array_to_string(list_sort(list_filter(
       |      string_split(substr(rawq, 2), '&'),
       |      x -> NOT (x LIKE 'utm\\_%' ESCAPE '\\' OR x LIKE 'gclid=%' OR x LIKE 'fbclid=%' OR x = ''))), '&') AS kept
       |    FROM (
       |      SELECT $cs,
       |        lower(regexp_extract(url, '$re', 1)) AS scheme,
       |        lower(regexp_extract(url, '$re', 2)) AS hostport,
       |        regexp_extract(url, '$re', 3) AS rawpath,
       |        regexp_extract(url, '$re', 4) AS rawq
       |      FROM $input))""".stripMargin
  }

  /** The hosted-URL synthesis + canonical host, as a WITH-clause body
    * shared by the two domain-operator oracles.
    */
  private def hostCtes: String =
    s"""m AS (
       |  SELECT doc_id,
       |    'https://' ||
       |    (CASE WHEN doc_id % 2 = 0
       |          THEN 'h' || CAST(doc_id % 7 AS VARCHAR) || '.site' || CAST(doc_id % 3 AS VARCHAR) || '.org'
       |          ELSE upper('h' || CAST(doc_id % 7 AS VARCHAR) || '.site' || CAST(doc_id % 3 AS VARCHAR) || '.org') END) ||
       |    '/' || source || '/p' || CAST(doc_id % 50 AS VARCHAR) AS url
       |  FROM documents),
       |c AS (
       |  ${canonSelectSql("m", Seq("doc_id"))}),
       |h AS (SELECT doc_id, regexp_extract(canon_url, '^[a-z0-9+.-]+://([^/:?#]+)', 1) AS host FROM c)""".stripMargin

  /** Same synthesis + same normalization, in DuckDB's dialect. */
  val oracle: Map[String, String] = Map(
    // suffix match expressed as the equivalent LIKE over the rule list
    // (the Spark side explodes label-boundary suffixes and equi-joins)
    "q_domain_blocklist" ->
      s"""WITH $hostCtes,
         |bl AS (SELECT * FROM (VALUES ${blockedDomains.map(d => s"('$d')").mkString(", ")}) AS t(rule)),
         |mt AS (
         |  SELECT doc_id, MIN(rule) AS rule
         |  FROM h JOIN bl ON h.host = bl.rule OR h.host LIKE '%.' || bl.rule
         |  GROUP BY doc_id)
         |SELECT COALESCE(rule, '_kept') AS bucket, COUNT(*) AS n_docs
         |FROM h LEFT JOIN mt USING (doc_id)
         |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_host_cap" ->
      s"""WITH $hostCtes,
         |r AS (SELECT host, doc_id,
         |        CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) AS BIGINT) AS rk
         |      FROM h)
         |SELECT host, doc_id, rk FROM r WHERE rk <= 3 ORDER BY host, rk""".stripMargin,
    "q_host_cap_stats" ->
      s"""WITH $hostCtes
         |SELECT host, COUNT(*) AS n_docs,
         |  CAST(LEAST(COUNT(*), 3) AS BIGINT) AS n_kept,
         |  CAST(COUNT(*) - LEAST(COUNT(*), 3) AS BIGINT) AS n_dropped
         |FROM h GROUP BY host ORDER BY host""".stripMargin,
    // string-prefix match expressed as the equivalent LIKE (the Spark
    // side explodes bounded path prefixes and equi-joins); longest
    // match wins, allow beats disallow at equal length
    "q_robots_filter" ->
      s"""WITH $hostCtes,
         |p AS (
         |  SELECT d.doc_id, h.host,
         |    '/' || d.source || '/p' || CAST(d.doc_id % 50 AS VARCHAR) AS path
         |  FROM documents d JOIN h ON d.doc_id = h.doc_id),
         |r AS (SELECT * FROM (VALUES ${robotsRules.map { case (h, pfx, a) =>
             s"('$h', '$pfx', $a)" }.mkString(", ")}) AS t(rhost, prefix, allow)),
         |mt AS (
         |  SELECT p.doc_id, r.prefix, r.allow,
         |    row_number() OVER (PARTITION BY p.doc_id
         |      ORDER BY length(r.prefix) DESC, r.allow DESC) AS rn
         |  FROM p JOIN r ON p.host = r.rhost AND p.path LIKE r.prefix || '%')
         |SELECT p.doc_id, p.host, w.prefix AS rule,
         |  CASE WHEN w.allow IS NULL OR w.allow THEN 'allow' ELSE 'block' END AS verdict
         |FROM p LEFT JOIN (SELECT * FROM mt WHERE rn = 1) w USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_url_canon" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTPS' END) ||
        |    '://' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM' ELSE 'example.com' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
        |    '/' || source || '/p' || CAST(doc_id % 50 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '?utm_source=x&ref=' || CAST(doc_id % 10 AS VARCHAR)
        |          WHEN doc_id % 6 = 3 THEN '?ref=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_campaign=y'
        |          ELSE '?ref=' || CAST(doc_id % 10 AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  ${canonSelectSql("m", Seq("doc_id"))})
        |SELECT canon_url, MIN(doc_id) AS keeper_id, COUNT(*) AS n_variants
        |FROM c GROUP BY canon_url ORDER BY canon_url""".stripMargin)
}

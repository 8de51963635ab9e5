package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface registration of graft's custom expressions so they are
  * callable as `graft_cosine(...)` / `graft_from_avro(...)` from
  * `spark.sql` — wired either at session build time via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, or into a
  * live session with [[GraftFunctions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // no-op until spark.graft.rangeJoin.binWidth is set, so always safe
    ext.injectOptimizerRule(_ => new graft.plans.RangeBinJoinRule)
    // SQL name surface for the ACID table format: resolves
    // graft_tx.<name> (incl. VERSION/TIMESTAMP AS OF) — inert unless
    // the reserved namespace is used, so always safe
    ext.injectResolutionRule(s => new graft.core.TxRelationRule(s))
    // manifest-stat file skipping for filters over TxTable snapshot
    // relations — inert unless the relation is skip-registered
    ext.injectOptimizerRule(_ => new graft.plans.TxSkipRule)
    // SQL DML for GraftCatalog tables the V1/V2 shims cannot plan —
    // dynamic INSERT OVERWRITE, UPDATE, MERGE INTO, non-pushable
    // DELETE — inert unless the write target is a GraftTable relation
    ext.injectPostHocResolutionRule(s => new graft.sql.GraftSqlDmlRule(s))
    // batch CDC by name: spark.read.option("readChangeFeed", true)
    // .table(...) — inert unless the option is set on a GraftTable
    ext.injectResolutionRule(s => new graft.sql.GraftCdfReadRule(s))
    // SELECT * FROM table_changes('cat.ns.t', from[, to])
    ext.injectTableFunction((FunctionIdentifier("table_changes"),
      new ExpressionInfo("graft.sql.GraftCdfRead", "table_changes"),
      (es: Seq[Expression]) => graft.sql.GraftCdfRead.tableChangesPlan(es)))
  }
}

object GraftFunctions {

  private def strLit(e: Expression, arg: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$arg must be a string literal, got $other")
  }

  /** Parse eagerly so a bad schema string fails at analysis time with
    * a useful message, not mid-job on the first row.
    */
  private def validatedSchema(json: String, arg: String): String = {
    try new org.apache.avro.Schema.Parser().parse(json)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"$arg is not a valid Avro schema: ${e.getMessage}")
    }
    json
  }

  /** (name, info, builder) triples shared by the extension and the
    * live-session registrar.
    */
  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_cosine_q",
      new ExpressionInfo(classOf[QuantizedCosine].getName, "graft_cosine_q"),
      (es: Seq[Expression]) => QuantizedCosine(es(0), es(1))),
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (es: Seq[Expression]) => es match {
        // accept any foldable integral literal (an integer SQL literal
        // may arrive typed INT, BIGINT, or SMALLINT — e.g. 3L or a
        // foldable cast); reject non-foldable args at analysis time
        // with a typed message instead of an opaque eval error
        case Seq(toks, w) =>
          def toW(v: Any, src: Expression): Int = v match {
            case i: Int => i
            case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case _ => throw new IllegalArgumentException(
              s"graft_shingle_hashes w must be an integral literal " +
                s"(INT/BIGINT/SMALLINT in int range), got ${src.sql}")
          }
          ShingleHashes(toks, w match {
            case Literal(v, _) => toW(v, w)
            // a foldable non-literal (e.g. CAST(3 AS BIGINT) before
            // constant folding) is still analysis-time evaluable
            case e if e.foldable => toW(e.eval(null), e)
            case other => throw new IllegalArgumentException(
              s"graft_shingle_hashes w must be a foldable integral " +
                s"literal, got the non-foldable expression ${other.sql}")
          })
        case other => throw new IllegalArgumentException(
          s"graft_shingle_hashes expects (array<string>, w), got ${other.size} args")
      }),
    ("graft_simhash",
      new ExpressionInfo(classOf[SimHashFold].getName, "graft_simhash"),
      (es: Seq[Expression]) => es match {
        case Seq(pairs) => SimHashFold(pairs)
        case other => throw new IllegalArgumentException(
          s"graft_simhash expects one array<struct<th,tf>> arg, got ${other.size}")
      }),
    ("graft_winnow_fps",
      new ExpressionInfo(classOf[WinnowFps].getName, "graft_winnow_fps"),
      (es: Seq[Expression]) => es match {
        case Seq(toks, w, win) =>
          def intLit(e: Expression, arg: String): Int = e match {
            case Literal(i: Int, _) => i
            case e2 if e2.foldable => e2.eval(null) match {
              case i: Int => i
              case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
              case other => throw new IllegalArgumentException(
                s"graft_winnow_fps $arg must be an integral literal, got $other")
            }
            case other => throw new IllegalArgumentException(
              s"graft_winnow_fps $arg must be a foldable integral literal, got ${other.sql}")
          }
          WinnowFps(toks, intLit(w, "w"), intLit(win, "win"))
        case other => throw new IllegalArgumentException(
          s"graft_winnow_fps expects (array<string>, w, win), got ${other.size} args")
      }),
    ("graft_from_avro",
      new ExpressionInfo(classOf[AvroDecode].getName, "graft_from_avro"),
      (es: Seq[Expression]) => {
        def schemaArg(e: Expression, arg: String): String =
          validatedSchema(strLit(e, arg), arg)
        es match {
          case Seq(child, writer) =>
            val w = schemaArg(writer, "writerSchemaJson")
            AvroDecode(child, w, w, permissive = false)
          case Seq(child, writer, reader) =>
            AvroDecode(child, schemaArg(writer, "writerSchemaJson"),
              schemaArg(reader, "readerSchemaJson"), permissive = false)
          case Seq(child, writer, reader, permissive) =>
            AvroDecode(child, schemaArg(writer, "writerSchemaJson"),
              schemaArg(reader, "readerSchemaJson"),
              permissive.eval(null).asInstanceOf[Boolean])
          case other => throw new IllegalArgumentException(
            s"graft_from_avro expects 2-4 args, got ${other.size}")
        }
      }))

  /** Register all graft functions into a live session's registry. */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    registerSqlUdfs(spark)
  }

  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(\\\\?[^#]*)?(#.*)?$"

  /** The composed-builtin column ops (URL canonicalization, HTTP
    * split) surfaced by name as Spark SQL UDFs — their bodies are the
    * same expression trees the Scala API composes (the drift guard in
    * UrlOpsSpec/WarcSpec asserts SQL ≡ Scala on randomized input).
    * CREATE OR REPLACE, so re-registration is idempotent.
    */
  def registerSqlUdfs(spark: SparkSession): Unit = {
    val re = UrlRe
    def scheme = s"lower(regexp_extract(url, '$re', 1))"
    def hostport = s"lower(regexp_extract(url, '$re', 2))"
    def rawpath = s"regexp_extract(url, '$re', 3)"
    def rawq = s"regexp_extract(url, '$re', 4)"
    val kept = s"array_join(array_sort(filter(split(substr($rawq, 2), '&'), " +
      "x -> NOT (startswith(x, 'utm_') OR startswith(x, 'gclid=') OR " +
      "startswith(x, 'fbclid=') OR x = ''))), '&')"
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION graft_canonicalize_url(url STRING)
         |RETURNS STRING RETURN CONCAT(
         |  $scheme, '://',
         |  CASE WHEN $scheme = 'https' AND endswith($hostport, ':443')
         |         THEN substring_index($hostport, ':', 1)
         |       WHEN $scheme = 'http' AND endswith($hostport, ':80')
         |         THEN substring_index($hostport, ':', 1)
         |       ELSE $hostport END,
         |  CASE WHEN length($rawpath) = 0 OR $rawpath = '/' THEN '/'
         |       ELSE rtrim('/', $rawpath) END,
         |  CASE WHEN length($rawq) = 0 OR length($kept) = 0 THEN ''
         |       ELSE CONCAT('?', $kept) END)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_http_status(payload BINARY)
        |RETURNS INT RETURN
        |  CASE WHEN regexp_extract(CAST(payload AS STRING),
        |         '^HTTP/[0-9.]+ ([0-9]{3})', 1) <> ''
        |       THEN CAST(regexp_extract(CAST(payload AS STRING),
        |         '^HTTP/[0-9.]+ ([0-9]{3})', 1) AS INT) END""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_http_body(payload BINARY)
        |RETURNS STRING RETURN
        |  CASE WHEN locate('\r\n\r\n', CAST(payload AS STRING)) > 0
        |       THEN substring(CAST(payload AS STRING),
        |         locate('\r\n\r\n', CAST(payload AS STRING)) + 4,
        |         length(CAST(payload AS STRING)))
        |       ELSE '' END""".stripMargin)
  }
}

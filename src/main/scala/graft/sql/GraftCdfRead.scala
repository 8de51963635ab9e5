package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TxTable

/** Batch CDC reads over catalog tables, the two published SQL
  * surfaces:
  *
  * {{{
  *   -- reader options (rewritten by [[GraftCdfReadRule]]):
  *   spark.read.option("readChangeFeed", true)
  *     .option("startingVersion", 1)[.option("endingVersion", 3)]
  *     .table("cat.ns.t")
  *
  *   -- the table-valued function (registered by GraftExtensions):
  *   SELECT * FROM table_changes('cat.ns.t', 1[, 3])
  * }}}
  *
  * Both resolve to [[TxTable.readChangeFeed]] over a closed version
  * range — O(changed rows), rewrite commits skipped, appends
  * synthesized as inserts — never a table rescan. A relation's fixed
  * schema cannot carry the extra change columns, so the rewrite
  * happens at RESOLUTION time, swapping the v2 relation for the
  * change-feed plan before any column above it resolves.
  */
class GraftCdfReadRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
        r.options.getBoolean("readChangeFeed", false) =>
      val g = r.table.asInstanceOf[GraftTable]
      require(g.versionAsOf.isEmpty,
        s"${g.name}: readChangeFeed and VERSION/TIMESTAMP AS OF don't mix — " +
          "the change feed addresses its own version range")
      val from = Option(r.options.get("startingVersion")).map(_.toLong).getOrElse(
        throw new IllegalArgumentException(
          s"${g.name}: readChangeFeed needs option(\"startingVersion\", n) — " +
            "an unbounded from-the-beginning CDC read is a snapshot read in " +
            "disguise; use the plain table for that"))
      val t = new TxTable(session, g.dir)
      val to = Option(r.options.get("endingVersion")).map(_.toLong)
        .getOrElse(t.version)
      // startingVersion is INCLUSIVE (the published option semantics);
      // the engine range is (from, to]
      t.readChangeFeed(from - 1, to).queryExecution.analyzed
  }
}

private[graft] object GraftCdfRead {

  /** `table_changes(name, from[, to])` plan builder: `name` is a
    * catalog-qualified table (`cat.ns.t` — the catalog must be a
    * [[GraftCatalog]]) or a filesystem path to a table directory.
    */
  def tableChangesPlan(es: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    require(es.size == 2 || es.size == 3,
      s"table_changes expects (name, fromVersion[, toVersion]), got ${es.size} args")
    val name = es.head match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"table_changes name must be a string literal, got ${other.sql}")
    }
    def longLit(e: Expression, arg: String): Long = e match {
      case lit: Literal if lit.value != null => lit.value match {
        case i: Int => i.toLong
        case l: Long => l
        case s: Short => s.toLong
        case other => throw new IllegalArgumentException(
          s"table_changes $arg must be an integral literal, got $other")
      }
      case e2 if e2.foldable => e2.eval(null) match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"table_changes $arg must fold to an integral value, got $other")
      }
      case other => throw new IllegalArgumentException(
        s"table_changes $arg must be a literal version number, got ${other.sql}")
    }
    val tx =
      if (name.contains("/")) new TxTable(spark, name)
      else {
        val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
        require(parts.size >= 2,
          s"table_changes('$name'): qualify the table with its catalog " +
            "(cat[.ns].table) or pass a table directory path")
        spark.sessionState.catalogManager.catalog(parts.head) match {
          case g: GraftCatalog => g.txFor(parts.tail.mkString("."))
          case other => throw new IllegalArgumentException(
            s"table_changes('$name'): catalog ${parts.head} is not a " +
              s"GraftCatalog (got ${other.getClass.getSimpleName})")
        }
      }
    val from = longLit(es(1), "fromVersion")
    val to = if (es.size == 3) longLit(es(2), "toVersion") else tx.version
    // fromVersion is INCLUSIVE (table_changes' published semantics);
    // the engine range is (from, to]
    tx.readChangeFeed(from - 1, to).queryExecution.analyzed
  }
}

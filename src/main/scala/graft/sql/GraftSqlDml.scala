package graft.sql

import org.apache.spark.sql.{GraftStreamBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.{LeafRunnableCommand, RunnableCommand}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr

import graft.core.TxTable

/** SQL row-level DML for [[GraftCatalog]] tables — UPDATE, MERGE INTO,
  * and DELETE with a non-pushable predicate.
  *
  * Spark's own row-level machinery (`RewriteUpdateTable` etc.) needs a
  * `SupportsRowLevelOperations` connector that replans the statement
  * as a joined rewrite; this engine already HAS those verbs as atomic
  * commit-log operations ([[TxTable.update]],
  * [[TxTable.mergeConditional]], [[TxTable.delete]] — copy-on-write,
  * O(touched files), one commit, change feed included), so
  * [[GraftSqlDmlRule]] rewrites the analyzed statements straight onto
  * them. Clause expressions are detached from the analyzed plan at
  * rewrite time — resolved attributes become plain (or `t.`/`s.`
  * qualified, for merge) names and the expression is carried as its
  * SQL text, so the command node is a self-contained leaf (no dangling
  * attribute references for CheckAnalysis to reject) and the verb
  * re-resolves the text against its own read, exactly as a typed-API
  * caller writes it by hand.
  *
  * Unsupported statement shapes (non-equi merge conditions, multiple
  * insert clauses, nested-column assignments) throw loudly with the
  * typed-API pointer — never a silent semantic change.
  */
private[sql] object SqlDml {

  /** Detach an expression from the analyzed plan: resolved attributes
    * → quoted bare names, rendered to SQL text the verb re-parses.
    */
  def detachedSql(e: Expression): String = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }.sql

  /** Merge-clause SQL over `t.`/`s.` qualifiers (the
    * [[TxTable.MergeBuilder]] dialect).
    */
  def clauseSql(e: Expression, tOut: AttributeSet, sOut: AttributeSet): String =
    e.transform {
      case a: AttributeReference if tOut.contains(a) =>
        UnresolvedAttribute(Seq("t", a.name))
      case a: AttributeReference if sOut.contains(a) =>
        UnresolvedAttribute(Seq("s", a.name))
    }.sql

  /** The equi-key column names of a merge condition: a conjunction of
    * `target.k = source.k` (or `<=>`) with MATCHING names on both
    * sides. Anything else is unsupported — loudly.
    */
  def equiKeys(cond: Expression, tOut: AttributeSet, sOut: AttributeSet): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case o => Seq(o)
    }
    split(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference) => key(a, b, tOut, sOut)
      case EqualNullSafe(a: AttributeReference, b: AttributeReference) => key(a, b, tOut, sOut)
      case other => throw new UnsupportedOperationException(
        s"MERGE INTO on a graft table needs an equi-key ON condition " +
          s"(conjunction of target.k = source.k); got '${other.sql}' — " +
          "use TxTable.mergeBuilder for other shapes")
    }
  }

  private def key(a: AttributeReference, b: AttributeReference,
                  tOut: AttributeSet, sOut: AttributeSet): String = {
    val (t, s) =
      if (tOut.contains(a) && sOut.contains(b)) (a, b)
      else if (tOut.contains(b) && sOut.contains(a)) (b, a)
      else throw new UnsupportedOperationException(
        s"MERGE ON clause '${a.name} = ${b.name}' must compare a target " +
          "column with a source column")
    require(t.name == s.name,
      s"MERGE ON clause must match same-named key columns " +
        s"(got target.${t.name} = source.${s.name}) — alias the source " +
        "column to the target name")
    t.name
  }

  def assignmentName(k: Expression): String = k match {
    case a: AttributeReference => a.name
    case u: UnresolvedAttribute if u.nameParts.size == 1 => u.nameParts.head
    case other => throw new UnsupportedOperationException(
      s"only top-level column assignments are supported, got '${other.sql}'")
  }
}

/** `UPDATE <graft table> SET ... [WHERE ...]` → [[TxTable.update]],
  * or [[TxTable.updateMergeOnRead]] when the table opted into
  * deletion-vector DML ([[TxTable.MergeOnReadProp]]).
  */
case class GraftUpdateCommand(dir: String, set: Map[String, String],
                              condition: Option[String])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val t = new TxTable(session, dir)
    val pred = condition.map(expr).getOrElse(lit(true))
    val assigns = set.map { case (k, v) => k -> expr(v) }
    if (TxTable.mergeOnReadDml(t)) t.updateMergeOnRead(pred, assigns)
    else t.update(pred, assigns)
    Nil
  }
}

/** `DELETE FROM <graft table> WHERE <non-pushable predicate>` →
  * [[TxTable.delete]] (the pushable shapes stay on the
  * [[GraftTable]] `SupportsDelete` metadata path).
  */
case class GraftDeleteCommand(dir: String, condition: String)
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val t = new TxTable(session, dir)
    if (TxTable.mergeOnReadDml(t)) t.deleteMergeOnRead(expr(condition))
    else t.delete(expr(condition))
    Nil
  }
}

/** `MERGE INTO <graft table> USING ... ON ... WHEN ...` →
  * [[TxTable.mergeConditional]] via the builder. Clause data is
  * pre-converted to the builder's `t.`/`s.` SQL dialect at analysis
  * time; the source plan stays a child so it analyzes normally.
  */
case class GraftMergeCommand(dir: String, keys: Seq[String],
    matched: Seq[(String, Option[String], Map[String, String])],
    insert: Option[(Option[String], Map[String, String])],
    bySource: Seq[(String, Option[String], Map[String, String])],
    source: LogicalPlan, evolve: Boolean = false)
    extends RunnableCommand {

  override def children: Seq[LogicalPlan] = Seq(source)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): GraftMergeCommand =
    copy(source = newChildren.head)

  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftStreamBridge.ofRows(session, source)
    var b = new TxTable(session, dir).mergeBuilder(src, keys)
    if (evolve) b = b.withSchemaEvolution()
    matched.foreach {
      case ("update", cond, set) if set.isEmpty => b = b.whenMatchedUpdateAll(cond.orNull)
      case ("update", cond, set) => b = b.whenMatchedUpdate(set, cond.orNull)
      case ("delete", cond, _) => b = b.whenMatchedDelete(cond.orNull)
      case (other, _, _) => throw new IllegalStateException(s"matched clause $other")
    }
    insert.foreach {
      case (cond, values) if values.isEmpty => b = b.whenNotMatchedInsertAll(cond.orNull)
      case (cond, values) => b = b.whenNotMatchedInsert(values, cond.orNull)
    }
    bySource.foreach {
      case ("update", cond, set) => b = b.whenNotMatchedBySourceUpdate(set, cond.orNull)
      case ("delete", cond, _) => b = b.whenNotMatchedBySourceDelete(cond.orNull)
      case (other, _, _) => throw new IllegalStateException(s"by-source clause $other")
    }
    b.run()
    Nil
  }
}

/** Post-hoc resolution rewrites for every SQL DML statement Spark's
  * V1/V2 shims cannot plan against a [[GraftTable]]: dynamic-mode
  * INSERT OVERWRITE, UPDATE, MERGE INTO, and DELETE with a predicate
  * the `SupportsDelete` filter path cannot express. Inert on any other
  * table.
  */
class GraftSqlDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def graftDir(p: LogicalPlan): Option[String] = p match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some(g.dir)
      case _ => None
    }
    // UPDATE/MERGE targets may sit under an alias; unwrap it
    case SubqueryAlias(_, child) => graftDir(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation, q, _, _, _)
        if q.resolved && r.table.isInstanceOf[GraftTable] =>
      GraftDynamicOverwrite(r.table.asInstanceOf[GraftTable].dir, o.query)

    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftDir(target).isDefined =>
      GraftUpdateCommand(graftDir(target).get,
        assignments.map(a =>
          SqlDml.assignmentName(a.key) -> SqlDml.detachedSql(a.value)).toMap,
        condition.map(SqlDml.detachedSql))

    case d @ DeleteFromTable(target, condition)
        if d.resolved && graftDir(target).isDefined &&
          !GraftSqlDmlRule.pushable(condition) =>
      GraftDeleteCommand(graftDir(target).get, SqlDml.detachedSql(condition))

    case m: MergeIntoTable if m.resolved && graftDir(m.targetTable).isDefined =>
      val dir = graftDir(m.targetTable).get
      val tOut = m.targetTable.outputSet
      val sOut = m.sourceTable.outputSet
      val keys = SqlDml.equiKeys(m.mergeCondition, tOut, sOut)
      def sql(e: Expression) = SqlDml.clauseSql(e, tOut, sOut)
      def setOf(as: Seq[Assignment]) =
        as.map(a => SqlDml.assignmentName(a.key) -> sql(a.value)).toMap
      // star actions normally reach here already expanded into
      // explicit assignments by the analyzer; if one survives, its
      // clause condition MUST ride along — dropping it would
      // update/insert rows the user's AND-condition excluded
      val matched = m.matchedActions.map {
        case UpdateAction(c, as, _) => ("update", c.map(sql), setOf(as))
        case UpdateStarAction(c) =>
          ("update", c.map(sql), Map.empty[String, String])
        case DeleteAction(c) => ("delete", c.map(sql), Map.empty[String, String])
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN MATCHED action $other")
      }
      val inserts = m.notMatchedActions.map {
        case InsertAction(c, as) => (c.map(sql), setOf(as))
        case InsertStarAction(c) => (c.map(sql), Map.empty[String, String])
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED action $other")
      }
      require(inserts.size <= 1,
        "at most one WHEN NOT MATCHED THEN INSERT clause is supported " +
          "on a graft table — fold the conditions into one clause")
      val bySource = m.notMatchedBySourceActions.map {
        case UpdateAction(c, as, _) => ("update", c.map(sql), setOf(as))
        case DeleteAction(c) => ("delete", c.map(sql), Map.empty[String, String])
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action $other")
      }
      GraftMergeCommand(dir, keys, matched, inserts.headOption, bySource,
        m.sourceTable, evolve = m.withSchemaEvolution)
  }
}

object GraftSqlDmlRule {
  /** Mirror of the `SupportsDelete` path's reach: TRUE when the delete
    * condition translates to pushable filters, so the metadata path
    * handles it and the rewrite must stay out of the way.
    */
  private[sql] def pushable(condition: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Literal => L, _}
    def atom(a: Expression, b: Expression): Boolean =
      (a.isInstanceOf[AttributeReference] && b.isInstanceOf[L]) ||
        (b.isInstanceOf[AttributeReference] && a.isInstanceOf[L])
    def ok(e: Expression): Boolean = e match {
      case And(l, r) => ok(l) && ok(r)
      case Or(l, r) => ok(l) && ok(r)
      case Not(c) => ok(c)
      case EqualTo(a, b) => atom(a, b)
      case EqualNullSafe(a, b) => atom(a, b)
      case GreaterThan(a, b) => atom(a, b)
      case GreaterThanOrEqual(a, b) => atom(a, b)
      case LessThan(a, b) => atom(a, b)
      case LessThanOrEqual(a, b) => atom(a, b)
      case In(_: AttributeReference, vs) => vs.forall(_.isInstanceOf[L])
      case IsNull(_: AttributeReference) | IsNotNull(_: AttributeReference) => true
      case StartsWith(a, b) => atom(a, b)
      case EndsWith(a, b) => atom(a, b)
      case Contains(a, b) => atom(a, b)
      case _: L => true
      case _ => false
    }
    ok(condition)
  }
}

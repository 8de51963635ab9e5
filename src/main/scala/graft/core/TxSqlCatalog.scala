package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

/** SQL name surface for [[TxTable]]: tables registered here are
  * addressable from `spark.sql` under the reserved `graft_tx`
  * namespace, including SQL time travel —
  *
  * {{{
  *   new TxTable(spark, path).registerSql("orders_acid")
  *   spark.sql("SELECT ... FROM graft_tx.orders_acid")
  *   spark.sql("SELECT ... FROM graft_tx.orders_acid VERSION AS OF 3")
  *   spark.sql("SELECT ... FROM graft_tx.orders_acid TIMESTAMP AS OF '2026-08-01'")
  * }}}
  *
  * The registry maps name → table DIRECTORY (no session state), so it
  * is JVM-wide like Spark's global temp views; each resolution opens
  * the table fresh, so SQL always sees the newest committed version —
  * snapshot isolation is per-query, exactly as with [[TxTable.read]].
  *
  * Resolution is a plain analyzer [[Rule]] injected by
  * [[graft.functions.GraftExtensions]] (`spark.sql.extensions` on a
  * cluster, `withExtensions` programmatically): the relation resolves
  * to the snapshot's pruned parquet relation, so filter pushdown,
  * column pruning and file skipping are exactly the batch read path's.
  * Reads only — mutations are the typed API ([[TxTable.append]],
  * [[TxTable.merge]], ...), where the concurrency contract is explicit.
  */
object TxSqlCatalog {
  val Namespace = "graft_tx"

  private val tables = new ConcurrentHashMap[String, String]()

  def register(name: String, tablePath: String): Unit =
    tables.put(name.toLowerCase, tablePath)

  def unregister(name: String): Unit = tables.remove(name.toLowerCase)

  def pathOf(name: String): Option[String] = Option(tables.get(name.toLowerCase))
}

/** Resolves `graft_tx.<name>` relations (and their `VERSION AS OF` /
  * `TIMESTAMP AS OF` forms) against [[TxSqlCatalog]]. Names under the
  * namespace that were never registered fail loudly here with the
  * registry's vocabulary instead of falling through to Spark's
  * catalog-miss error.
  */
class TxRelationRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def nameOf(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(ns, name) if ns.equalsIgnoreCase(TxSqlCatalog.Namespace) => Some(name)
      case _ => None
    }

  private def tableFor(name: String, u: UnresolvedRelation): TxTable = {
    require(!u.isStreaming,
      s"graft_tx.$name: SQL streaming reads are not supported — use " +
        "spark.readStream.format(\"graft-txtable\").option(\"path\", ...)")
    val path = TxSqlCatalog.pathOf(name).getOrElse(throw new IllegalArgumentException(
      s"no TxTable registered as graft_tx.$name — call " +
        "TxTable.registerSql(\"" + name + "\") first"))
    new TxTable(session, path)
  }

  /** `TIMESTAMP AS OF <expr>` arrives as an arbitrary constant
    * expression (usually a string literal); cast in the session zone
    * and floor micros to the millis [[TxTable.readAsOfTimestamp]]
    * expects.
    */
  private def evalMillis(name: String, e: Expression): Long = {
    require(e.foldable, s"graft_tx.$name TIMESTAMP AS OF must be a constant")
    val micros = Cast(e, TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
    require(micros != null, s"graft_tx.$name TIMESTAMP AS OF evaluated to NULL")
    Math.floorDiv(micros.asInstanceOf[Long], 1000L)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // reject INSERT before the bare-relation case below resolves the
    // target to a plain parquet relation: Spark would then plan a
    // DIRECT parquet write into the table directory, bypassing the
    // commit log — files a reader would (correctly) never see
    plan.foreach {
      case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
        i.table match {
          case u: UnresolvedRelation if nameOf(u).isDefined =>
            throw new IllegalArgumentException(
              s"graft_tx.${nameOf(u).get} is read-only through SQL — write " +
                "with df.write.format(\"graft-txtable\") or the TxTable API " +
                "(append/overwrite/merge/update), where commits are atomic")
          case _ => ()
        }
      case _ => ()
    }
    resolveRelations(plan)
  }

  private def resolveRelations(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // RelationTimeTravel is an unresolved LEAF (its relation is a
    // field, not a child), so the bare UnresolvedRelation case below
    // can never fire on a time-travelled relation first
    case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver) if nameOf(u).isDefined =>
      val name = nameOf(u).get
      val t = tableFor(name, u)
      (ver, ts) match {
        case (Some(v), _) =>
          val vl = try v.toLong catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"graft_tx.$name VERSION AS OF needs a numeric version, got '$v'")
          }
          t.readAt(vl).queryExecution.analyzed
        case (None, Some(e)) =>
          t.readAsOfTimestamp(evalMillis(name, e)).queryExecution.analyzed
        case (None, None) => tt // parser never emits this; leave it
      }
    case u: UnresolvedRelation if nameOf(u).isDefined =>
      tableFor(nameOf(u).get, u).read().queryExecution.analyzed
  }
}

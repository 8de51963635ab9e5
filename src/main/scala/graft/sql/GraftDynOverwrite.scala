package graft.sql

import org.apache.spark.sql.{GraftStreamBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.RunnableCommand

import graft.core.TxTable

/** SQL dynamic partition overwrite for [[GraftCatalog]] tables.
  *
  * Spark's V1-write shim covers append / truncate / overwrite-by-
  * filter but has no dynamic-overwrite physical node
  * (`TableCapabilityCheck` demands a full V2 `BATCH_WRITE` there), so
  * `INSERT OVERWRITE` under
  * `spark.sql.sources.partitionOverwriteMode=dynamic` is rewritten at
  * analysis time ([[GraftSqlDmlRule]]) into this command, which runs
  * the table format's own atomic verb — [[TxTable.overwriteDynamic]]:
  * one commit replacing exactly the partitions present in the incoming
  * rows. Installed by
  * [[graft.functions.GraftExtensions]]; without the extensions the
  * statement fails loudly with Spark's standard unsupported-feature
  * error (never silently as a full truncate).
  */
case class GraftDynamicOverwrite(dir: String, query: LogicalPlan)
    extends RunnableCommand {

  override def children: Seq[LogicalPlan] = Seq(query)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): GraftDynamicOverwrite =
    copy(query = newChildren.head)

  override def run(session: SparkSession): Seq[Row] = {
    val t = new TxTable(session, dir)
    val partCols = GraftCatalog.partColsOf(t)
    require(partCols.nonEmpty,
      s"dynamic INSERT OVERWRITE needs a PARTITIONED BY table (none declared on $dir)")
    t.overwriteDynamic(GraftStreamBridge.ofRows(session, query), partCols)
    Nil
  }
}


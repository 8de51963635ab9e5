package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftColumnBridge, GraftStreamBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

import graft.core.TxTable

/** Identity registry mapping a snapshot's BaseRelation instance to the
  * manifest stats that can prune it — populated by
  * [[graft.core.TxTable]] every time it builds a snapshot read, read
  * by [[TxSkipRule]]. Weak keys: entries die with their relation, so
  * the registry never outlives the plans it serves.
  */
private[graft] object TxSkipRegistry {
  case class SkipInfo(root: String, files: Seq[String],
                      stats: Map[String, TxTable.FileStats], schema: StructType,
                      blooms: Map[String, TxTable.BloomCfg] = Map.empty,
                      generated: Map[String, String] = Map.empty)

  private val infos =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[AnyRef, SkipInfo]())

  def register(relation: AnyRef, info: SkipInfo): Unit = infos.put(relation, info)
  def get(relation: AnyRef): Option[SkipInfo] = Option(infos.get(relation))
}

/** Manifest-stat FILE SKIPPING as a Catalyst optimizer rule: a filter
  * over any [[graft.core.TxTable]] snapshot relation — `spark.sql`
  * through the `graft_tx` name surface, `spark.read
  * .format("graft-txtable")`, or plain `table.read().where(...)` —
  * re-resolves the relation to only the files whose per-file min/max
  * stats might match the predicate, BEFORE the physical scan is
  * planned. [[graft.core.TxTable.scan]] does this explicitly at the
  * API level; this rule makes every declarative path get it for free,
  * which is the point at 100 TB: a range probe on a clustered table
  * plans a scan over the overlapping files only, with no listing of —
  * or footer reads against — the rest.
  *
  * Runs in the fixed-point user-rule batch AFTER predicate pushdown
  * has placed filters adjacent to their relations. Sound by
  * construction: pruning only removes files a conjunct PROVES empty
  * ([[graft.core.TxTable.filesToRead]]), the predicate itself is left
  * in place, and a rewritten relation is no longer registered, so the
  * fixed point converges. Wired two ways, mirroring
  * [[RangeBinJoinRule]]: injected by
  * [[graft.functions.GraftExtensions]], and auto-attached to the live
  * session's `experimental.extraOptimizations` by the first
  * [[graft.core.TxTable]] it touches.
  */
class TxSkipRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, lr: LogicalRelation) =>
      TxSkipRegistry.get(lr.relation) match {
        case None => f
        case Some(info) =>
          val spark = SparkSession.active
          val shapes = TxTable.deriveGeneratedShapes(info.generated,
            GraftColumnBridge.conjunctShapesCatalyst(cond))
          // same two stages as TxTable.scan: min/max kernel, then the
          // bloom sidecars for indexed equality/IN conjuncts
          val kept = TxTable.bloomPruneFiles(info.root,
            info.schema.fields.map(sf => sf.name -> sf.dataType).toMap,
            info.blooms, spark.sparkContext.hadoopConfiguration,
            TxTable.filesToRead(info.files, info.stats, shapes), shapes)
          if (kept.size >= info.files.size) f
          else {
            val pruned = GraftStreamBridge.parquetRelation(spark, info.schema,
              kept.map(n => new Path(info.root, n).toString))
            // reuse the original output attributes: downstream
            // references stay valid, only the file list shrank
            Filter(cond, lr.copy(relation = pruned))
          }
      }
  }
}

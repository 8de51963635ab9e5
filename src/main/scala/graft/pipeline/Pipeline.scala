package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codec.WireFormat
import graft.ingest.RawIngest
import graft.medallion.Medallion
import graft.schema.SchemaRegistry

/** The reference's 4-task DAG (ingest → bronze → silver → gold,
  * jobs/confluent.json:7-80, terraform/confluent_ingestion_job.tf:20-97)
  * as an in-process sequential runner: each stage is a checkpointed
  * AvailableNow streaming query over the previous stage's table, so a
  * re-run with the same checkpoints processes only new data (O5) —
  * the cross-stage contract is the shared table + checkpoint, exactly
  * as in the reference (max 1 concurrent run ≙ sequential execution).
  */
object Pipeline {

  case class Paths(base: String) {
    val raw = s"$base/raw"
    val bronze = s"$base/bronze"
    val silver = s"$base/silver"
    val gold = s"$base/gold"
    def checkpoint(stage: String): String = s"$base/_checkpoints/$stage" // ST2 layout
  }

  /** Run the full DAG over one streaming envelope source; returns the
    * gold table.
    */
  def run(spark: SparkSession, source: DataFrame, registry: SchemaRegistry,
          wire: WireFormat, paths: Paths, dayStart: java.sql.Timestamp,
          permissive: Boolean = false): DataFrame = {
    RawIngest.run(source, registry, wire, paths.raw, paths.checkpoint("raw"), permissive)
      .awaitTermination()
    Medallion.bronze(spark, paths.raw, paths.bronze, paths.checkpoint("bronze"))
      .awaitTermination()
    Medallion.silver(spark, paths.bronze, paths.silver, paths.checkpoint("silver"))
      .awaitTermination()
    // gold's state keys are the ≤45 (type, color, size) combinations —
    // 8 state partitions is generous at any corpus size, and each
    // avoided partition is one less serialized provider load per batch
    Medallion.gold(spark, paths.silver, paths.gold, paths.checkpoint("gold"), dayStart,
        stateParts = Some(8))
      .awaitTermination()
    spark.read.parquet(paths.gold)
  }
}

package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** Bridge into Spark's private[sql] plumbing for building the
  * DataFrame a streaming `Source.getBatch` must return: a relation
  * over an explicit file list whose logical plan is tagged
  * `isStreaming = true` (MicroBatchExecution rejects a batch-tagged
  * plan). This is exactly how Spark's own FileStreamSource — and
  * Delta's streaming source — construct their batches; the classes
  * involved (`DataSource`, `LogicalRelation`, `Dataset.ofRows`) are
  * package-private, hence this bridge.
  */
object GraftStreamBridge {

  /** A parquet relation over `paths` (absolute file paths) with the
    * given schema, tagged as a streaming batch. Empty `paths` yields
    * an empty streaming batch of the same schema. The relation is a
    * normal HadoopFsRelation, so per-micro-batch column pruning and
    * filter pushdown work unchanged.
    */
  /** The inverse direction, for a V1 `Sink.addBatch`: the micro-batch
    * DataFrame arrives streaming-tagged (so `.write` refuses it);
    * re-wrap its physical rows as a plain batch DataFrame — the same
    * re-wrap ForeachBatchSink performs before invoking the user
    * function. Lazy: the rows execute when the batch DF is consumed.
    */
  def asBatchDF(data: Dataset[Row]): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }

  /** Tag an arbitrary batch DataFrame's rows as a streaming batch —
    * for `Source.getBatch` results that are not a plain file relation
    * (e.g. a change-feed union with literal columns).
    */
  def asStreamingDF(data: Dataset[Row]): DataFrame = {
    val cs = data.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = true)
  }

  /** A resolved parquet BaseRelation over an explicit file list — the
    * batch-read analog of [[streamingParquetBatch]], for a
    * RelationProvider (`spark.read.format(...)`): a plain
    * HadoopFsRelation, so pushdown and pruning work unchanged.
    */
  def parquetRelation(spark: SparkSession, schema: StructType,
                      paths: Seq[String]): sources.BaseRelation = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty) {
      // empty snapshot: a trivially empty scan with the right schema
      val s = schema
      new sources.BaseRelation with sources.TableScan {
        override val sqlContext: SQLContext = cs.sqlContext
        override val schema: StructType = s
        override def buildScan(): org.apache.spark.rdd.RDD[Row] =
          cs.sparkContext.emptyRDD[Row]
      }
    } else {
      import org.apache.spark.sql.execution.datasources.DataSource
      DataSource(cs, className = "parquet", paths = paths,
        userSpecifiedSchema = Some(schema)).resolveRelation(checkFilesExist = false)
    }
  }

  def streamingParquetBatch(spark: SparkSession, schema: StructType,
                            paths: Seq[String]): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (paths.isEmpty)
      cs.internalCreateDataFrame(
        cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
        schema, isStreaming = true)
    else {
      import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
      val ds = DataSource(cs, className = "parquet", paths = paths,
        userSpecifiedSchema = Some(schema))
      classic.Dataset.ofRows(cs,
        LogicalRelation(ds.resolveRelation(checkFilesExist = false), isStreaming = true))
    }
  }

  /** An analyzed logical plan as a DataFrame — for a RunnableCommand
    * that captured its source query at analysis time (the
    * `Dataset.ofRows` every connector command uses, package-private,
    * hence here).
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a computed DataFrame as a TableScan BaseRelation — the batch
    * format's escape hatch for snapshots that cannot be a plain file
    * relation (deletion vectors applied at read time). Pushdown for
    * such a snapshot happens inside the wrapped plan, not at the
    * relation boundary.
    */
  def dataFrameRelation(df: DataFrame): sources.BaseRelation = {
    val cs = df.sparkSession.asInstanceOf[classic.SparkSession]
    new sources.BaseRelation with sources.TableScan {
      override val sqlContext: SQLContext = cs.sqlContext
      override val schema: StructType = df.schema
      override def buildScan(): org.apache.spark.rdd.RDD[Row] = df.rdd
    }
  }
}

package graft.ingest

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.codec.{ConfluentWire, GlueWire, WireFormat}
import graft.functions.AvroDecode
import graft.schema.SchemaRegistry

/** Kafka(-shaped) → raw table ingest with per-record schema-registry
  * resolution — the reference's signature algorithm (ST10): per
  * micro-batch, collect the distinct schema keys, resolve each id
  * against the registry, decode each group with its own writer schema,
  * and append all groups to one raw table whose schema widens as new
  * versions appear (ingest.scala:123-177, ingest_raw.scala:119-156).
  *
  * 100 TB notes (SURVEY.md §7.5.8): the driver-side collect is over
  * the *distinct schema ids* of a batch — bounded by registry size
  * (~handfuls), never O(rows); the per-group loop is O(#schemas)
  * appends; decode happens executor-side inside [[AvroDecode]] after
  * the schema-key filter, so each row is decoded once per batch (the
  * decoded groups are cached across the dead-letter probe and the
  * write when a DLQ is configured).
  */
object RawIngest {

  /** Metadata columns carried into the raw table (ingest.scala:155-161). */
  private val metaCols = Seq("topic", "partition", "offset", "timestamp", "timestampType", "key")

  /** Demux one (micro-)batch into per-schema decoded groups and run
    * `action` on them while the keyed batch is cached (the reference
    * caches the batch across group passes, P9 at ingest.scala:127 —
    * but leaks it; we release on exit). Group column layout: kafka
    * metadata + `parsedValue` struct.
    */
  def demux[T](batch: DataFrame, registry: SchemaRegistry, wire: WireFormat,
               permissive: Boolean = false, deadLetterPath: Option[String] = None,
               dlqCorrupt: Boolean = true)
              (action: Seq[DataFrame] => T): T = {
    val keyed = batch
      .withColumn("schemaKey", wire.schemaKeyCol(col("value")))
      .withColumn("payload", wire.payloadCol(col("value")))
      .persist()
    try {
      // P7/P8: tiny distinct set of schema keys crosses to the driver
      val keys = keyed.select(col("schemaKey")).distinct().collect().map(_.getAs[Array[Byte]](0))
      val resolved = keys.toSeq.map { keyBytes =>
        val schema = try {
          Some(wire match {
            // Confluent's schemaKeyCol is already just the 4 id bytes (F2)
            case ConfluentWire => registry.getById(ByteBuffer.wrap(keyBytes).getInt)
            case GlueWire => registry.getByUuid(GlueWire.uuidOf(keyBytes))
          })
        } catch {
          // Unresolvable group: unknown schema id (producer ahead of
          // this consumer's registry view) or a malformed/truncated
          // header (schemaKey shorter than the wire format —
          // ByteBuffer/index errors). With a dead-letter path the
          // group is preserved raw for replay; without one, fail the
          // batch (silent drops would violate at-least-once).
          case scala.util.control.NonFatal(e) =>
            if (deadLetterPath.isEmpty) throw e
            None
        }
        (keyBytes, schema)
      }
      deadLetterPath.foreach { dlq =>
        val unknown = resolved.collect { case (k, None) => k }
        if (unknown.nonEmpty) {
          keyed
            .filter(col("schemaKey").isin(unknown.map(x => x: Any): _*))
            .select((metaCols :+ "value").map(col): _*)
            .write.mode("append").parquet(dlq)
        }
      }
      // with a dead-letter path AND dlqCorrupt (the default), decode
      // PERMISSIVE regardless of the flag: a known-id, wrong-payload
      // record (rogue producer) must not abort the whole micro-batch —
      // its raw bytes land in the DLQ below and every healthy row
      // still commits. `dlqCorrupt = false` restores the strict
      // combination: the DLQ covers ONLY unknown schema ids and a
      // corrupt payload under permissive=false fails the batch.
      // Without a DLQ, FAILFAST keeps failing the batch
      // (at-least-once, no drops).
      val lenient = permissive || (deadLetterPath.isDefined && dlqCorrupt)
      val decodedGroups = resolved.collect { case (keyBytes, Some(schema)) =>
        val json = schema.toString
        keyed
          .filter(col("schemaKey") === lit(keyBytes)) // P5: group filter before decode (O4)
          .select((metaCols :+ "value").map(col) :+
            AvroDecode.fromAvro(col("payload"), json, json, lenient).as("parsedValue"): _*)
      }
      // cache the DECODED groups (not just the raw bytes) while both
      // the corrupt probe and the action consume them — without this
      // every row would pay the Avro decode twice per batch
      val probeCorrupt = deadLetterPath.isDefined && dlqCorrupt
      if (probeCorrupt) decodedGroups.foreach(_.persist())
      try {
        if (probeCorrupt) deadLetterPath.foreach { dlq =>
          // per-ROW isolation of decode failures, same raw layout as
          // the unknown-id groups above: one probe + at most one
          // append per batch, off the cached decoded frames
          val corrupt = decodedGroups
            .map(_.where(col("parsedValue").isNull)
              .select((metaCols :+ "value").map(col): _*))
            .reduceOption(_.unionByName(_))
          corrupt.foreach { c =>
            val n = c.count()
            if (n > 0) {
              // visible, not silent: under permissive=false this is a
              // deliberate semantic (DLQ row-isolation overrides
              // FAILFAST for known-id corrupt payloads; opt out with
              // dlqCorrupt=false)
              org.slf4j.LoggerFactory.getLogger(getClass)
                .warn(s"diverting $n corrupt known-schema row(s) to DLQ $dlq" +
                  (if (permissive) "" else " (FAILFAST overridden by dlqCorrupt=true)"))
              c.write.mode("append").parquet(dlq)
            }
          }
        }
        val groups = decodedGroups.map { d =>
          val clean =
            if (lenient) d.where(col("parsedValue").isNotNull) else d
          clean.drop("value")
        }
        action(groups)
      } finally if (probeCorrupt) decodedGroups.foreach(_.unpersist())
    } finally keyed.unpersist()
  }

  /** Demux + append each group to the raw parquet table. Appending
    * files of different (widening) schemas emulates Delta's
    * mergeSchema=true (ST9); [[readRaw]] merges on read.
    *
    * `unifiedWrite = false` mirrors the reference's per-schema-group
    * append loop (ingest.scala:142-171), which is at-least-once if a
    * later iteration fails (hazard SURVEY.md §7.5.6). `true` unions
    * the groups by name (null-padding narrow schemas) and performs
    * ONE append per micro-batch — all-or-nothing with the checkpoint,
    * i.e. effectively exactly-once.
    */
  def demuxToTable(batch: DataFrame, registry: SchemaRegistry, wire: WireFormat,
                   rawPath: String, permissive: Boolean = false,
                   deadLetterPath: Option[String] = None,
                   unifiedWrite: Boolean = false,
                   dlqCorrupt: Boolean = true): Unit =
    demux(batch, registry, wire, permissive, deadLetterPath, dlqCorrupt) { groups =>
      if (unifiedWrite && groups.nonEmpty)
        groups.reduce(_.unionByName(_, allowMissingColumns = true))
          .write.mode("append").parquet(rawPath)
      else
        groups.foreach(_.write.mode("append").parquet(rawPath)) // SNK4 analog
    }

  private def stagingPath(root: org.apache.hadoop.fs.Path, batchId: Long) =
    new org.apache.hadoop.fs.Path(root, s".staging_ingest_batch=$batchId")

  private def targetPath(root: org.apache.hadoop.fs.Path, batchId: Long) =
    new org.apache.hadoop.fs.Path(root, s"ingest_batch=$batchId")

  /** ATOMIC multi-schema batch commit (SURVEY §7.5.6). The per-group
    * append loop above is at-least-once: a crash between group
    * appends publishes a partial batch. Here every group is staged
    * into a dot-prefixed directory — invisible to parquet discovery —
    * and the whole batch becomes visible via ONE directory rename to
    * `ingest_batch=<id>/` (atomic on a POSIX/HDFS namespace; on
    * rename-less object stores this slot is where a manifest commit
    * goes). Crash before the rename ⇒ readers see nothing of the
    * batch; crash after ⇒ the foreachBatch replay finds the published
    * dir and skips ⇒ exactly-once end to end, per batch not per
    * group. The batch id lands as a partition column — free commit
    * lineage, and old batches drop by partition predicate.
    *
    * Use on a table written exclusively through this mode (mixing
    * root-level files with partition dirs breaks Spark's partition
    * discovery).
    */
  def demuxToTableAtomic(batch: DataFrame, registry: SchemaRegistry, wire: WireFormat,
                         rawPath: String, batchId: Long, permissive: Boolean = false,
                         deadLetterPath: Option[String] = None,
                         dlqCorrupt: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(rawPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(targetPath(root, batchId))) return // replay of a published batch
    stageBatch(batch, registry, wire, rawPath, batchId, permissive, deadLetterPath,
      dlqCorrupt)
    publishBatch(spark, rawPath, batchId)
  }

  /** Stage all decode groups of a batch into the invisible staging
    * dir (step 1 of [[demuxToTableAtomic]]; package-visible so the
    * crash-injection spec can stop between the steps).
    */
  private[graft] def stageBatch(batch: DataFrame, registry: SchemaRegistry, wire: WireFormat,
                                rawPath: String, batchId: Long, permissive: Boolean = false,
                                deadLetterPath: Option[String] = None,
                                dlqCorrupt: Boolean = true): Unit = {
    val spark = batch.sparkSession
    val root = new org.apache.hadoop.fs.Path(rawPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = stagingPath(root, batchId)
    fs.mkdirs(root)
    fs.delete(staging, true) // half-staged leftovers from a prior crash
    demux(batch, registry, wire, permissive, deadLetterPath, dlqCorrupt) { groups =>
      groups.foreach(_.write.mode("append").parquet(staging.toString))
    }
  }

  /** Publish a staged batch with one atomic rename (step 2). */
  private[graft] def publishBatch(spark: SparkSession, rawPath: String, batchId: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(rawPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = stagingPath(root, batchId)
    val target = targetPath(root, batchId)
    if (!fs.exists(staging)) return // empty batch staged nothing
    if (fs.exists(target)) { fs.delete(staging, true); return }
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"batch publish rename failed: $staging -> $target")
  }

  /** Raw table scan with schema merging across v1/v2-era files. */
  def readRaw(spark: SparkSession, rawPath: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(rawPath)

  /** Streaming ingest: foreachBatch demux (SNK3), checkpointed,
    * AvailableNow (the Spark-4 successor of the reference's
    * Trigger.Once, ST1).
    */
  def run(source: DataFrame, registry: SchemaRegistry, wire: WireFormat,
          rawPath: String, checkpoint: String, permissive: Boolean = false,
          queryName: String = "graftRawIngest",
          deadLetterPath: Option[String] = None,
          unifiedWrite: Boolean = false,
          atomic: Boolean = false,
          dlqCorrupt: Boolean = true): StreamingQuery =
    source.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (atomic)
          demuxToTableAtomic(batch, registry, wire, rawPath, batchId, permissive,
            deadLetterPath, dlqCorrupt)
        else
          demuxToTable(batch, registry, wire, rawPath, permissive, deadLetterPath,
            unifiedWrite, dlqCorrupt)
      }
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Bridge to Spark's private[sql] [[V2TableWithV1Fallback]]: a DSv2
  * catalog table mixing this in streams through its DSv1
  * source/sink provider — `spark.readStream.table(...)` and
  * `writeStream.toTable(...)` resolve the synthesized [[CatalogTable]]
  * (provider + path) instead of requiring a DSv2 MicroBatchStream.
  * The published bridge a table format uses when its streaming path
  * predates DSv2; lives here because the trait is private[sql].
  */
trait GraftV1StreamFallback extends V2TableWithV1Fallback {
  /** The synthesized catalog entry the V1 streaming resolution reads. */
  def graftV1Table: CatalogTable
  override def v1Table: CatalogTable = graftV1Table
}

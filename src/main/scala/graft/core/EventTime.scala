package graft.core

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-adaptive accessors for the `events.ts` column.
  *
  * The driver's testdata generator has shipped `events.ts` as both
  * parquet TIMESTAMP(NANOS) — which Spark 4 surfaces as LongType
  * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong` — and
  * TIMESTAMP_MICROS, which surfaces as TIMESTAMP_NTZ (or TimestampType
  * when the writer marks it UTC-adjusted). Query semantics (reference
  * silver.py:24-27 / gold.py:24-27: second-truncated monotone event
  * time) must not depend on which encoding a given regeneration used,
  * so every consumer goes through these helpers, which branch on the
  * LOADED schema rather than assuming one physical type.
  *
  * All sessions run with session timezone UTC ([[Sessions.local]]), so
  * NTZ values are epoch-aligned and every branch below yields the same
  * epoch seconds the DuckDB oracle computes via `epoch_ms(ts) // 1000`.
  */
object EventTime {

  /** Epoch seconds from `ts`, exact and monotone for every encoding:
    * integer division for long nanos, second-truncating casts for the
    * timestamp types (NTZ first hops through TimestampType, which under
    * the UTC session zone is a pure reinterpretation).
    */
  def sec(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000000000")
    case TimestampNTZType => col("ts").cast(TimestampType).cast(LongType)
    case TimestampType => col("ts").cast(LongType)
    case dt => throw new IllegalArgumentException(
      s"events.ts has unsupported type $dt; expected LONG (nanos), TIMESTAMP or TIMESTAMP_NTZ")
  }

  /** A literal comparable against the RAW `ts` column — same type as
    * the loaded schema, so range predicates stay pushdown-eligible
    * (parquet row-group stats + TxTable data skipping) instead of
    * wrapping the scan column in arithmetic.
    */
  def atUtc(df: DataFrame, isoInstant: String): Column = {
    val i = Instant.parse(isoInstant)
    df.schema("ts").dataType match {
      case LongType =>
        lit(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000000L), i.getNano.toLong))
      case TimestampNTZType => lit(LocalDateTime.ofInstant(i, ZoneOffset.UTC))
      case TimestampType => lit(i)
      case dt => throw new IllegalArgumentException(
        s"events.ts has unsupported type $dt; expected LONG (nanos), TIMESTAMP or TIMESTAMP_NTZ")
    }
  }
}

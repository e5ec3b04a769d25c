package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-adaptive accessors for the events table's `ts` column.
  *
  * The driver's testdata has shipped `events.ts` under two physical types
  * across regenerations — epoch-nanoseconds INT64 (read as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) and parquet TIMESTAMP(MICROS)
  * (read as TimestampNTZType) — and a silent flip between them once broke
  * every query doing `ts div 1000` arithmetic. All event-time arithmetic
  * goes through these two accessors so the next physical-type drift is a
  * one-line fix here instead of an eight-query breakage.
  *
  * Canonical unit: EPOCH MICROSECONDS as BIGINT. Both known physical types
  * carry µs-or-coarser instants, so the µs view is lossless and cross-engine
  * exact (DuckDB side: `epoch_us(ts)`).
  *
  * The TIMESTAMP_NTZ → TIMESTAMP cast is an identity on the wall-clock
  * instant because every session in this repo pins
  * `spark.sql.session.timeZone=UTC` (Verify/Bench/tools/tests) — the same
  * contract q13_asof_join already relies on for `o_orderdate`.
  */
object Events {

  /** Epoch-microseconds BIGINT view of `df`'s `colName`, whatever its
    * physical type. Fails loudly on an unrecognized type rather than
    * producing silently-shifted arithmetic.
    */
  def microsExpr(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      // legacy layout: epoch-nanos INT64 (TIMESTAMP(NANOS) under
      // nanosAsLong); integer div — `/` would be double division
      case LongType => expr(s"`$colName` div 1000")
      case TimestampNTZType => unix_micros(col(colName).cast(TimestampType))
      case TimestampType => unix_micros(col(colName))
      case dt =>
        throw new IllegalArgumentException(
          s"events.$colName has unsupported type ${dt.sql}: expected " +
            "epoch-nanos BIGINT, TIMESTAMP, or TIMESTAMP_NTZ")
    }

  /** Proper TIMESTAMP event-time view of `colName` (for watermarks and
    * window()), adaptive on the same physical types as [[microsExpr]].
    */
  def eventTimeExpr(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case LongType => timestamp_micros(expr(s"`$colName` div 1000"))
      case TimestampNTZType => col(colName).cast(TimestampType)
      case TimestampType => col(colName)
      case dt =>
        throw new IllegalArgumentException(
          s"events.$colName has unsupported type ${dt.sql}: expected " +
            "epoch-nanos BIGINT, TIMESTAMP, or TIMESTAMP_NTZ")
    }
}

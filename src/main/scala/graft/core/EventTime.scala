package graft.core

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Schema-adaptive access to the `events.ts` event-time column.
  *
  * The driver's testdata has shipped `ts` under two different parquet
  * physical types across regenerations:
  *
  *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects nanos, so
  *    Sessions sets `spark.sql.legacy.parquet.nanosAsLong` and the column
  *    arrives as LongType epoch-NANOSECONDS;
  *  - plain `timestamp[us]` (no timezone): `nanosAsLong` is a no-op and
  *    the column arrives as TIMESTAMP_NTZ at µs precision.
  *
  * Every consumer (queries.Events, operators.AsOfJoin/RangeJoin,
  * streaming.Streams ingestion) goes through these two accessors instead
  * of hard-coding either physical type, so a driver-side regeneration of
  * the data cannot silently break the engine again (round-8 lesson: the
  * ns→µs drift errored 12 queries). DuckDB truncates TIMESTAMP(NANOS) to
  * its µs TIMESTAMP on read, so µs is the cross-engine comparable domain
  * in BOTH cases; values are post-1970, making `div` floor-division equal
  * to truncation.
  */
object EventTime {

  private def tsType(df: Dataset[_]) = df.schema("ts").dataType

  /** `ts` as epoch-MICROSECONDS (LongType), whatever the physical type. */
  def tsMicros(df: Dataset[_]): Column = tsType(df) match {
    // `div` is INTEGER division — `col/1000` is true-division through
    // double, which loses ns precision above 2^53 (any epoch-ns value)
    case LongType => expr("ts div 1000")
    case TimestampType | TimestampNTZType =>
      // UTC session TZ (Sessions) makes the NTZ→LTZ cast instant-preserving
      unix_micros(col("ts").cast(TimestampType))
    case other =>
      throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected LongType " +
          "(legacy nanos-as-long), TimestampType, or TimestampNTZType; " +
          "did the driver regenerate testdata with a new physical type?")
  }

  /** `ts` as µs-precision TimestampType (LTZ — the class the oracle
    * compare schema-matches against, same as the pre-drift engine). */
  def tsTimestamp(df: Dataset[_]): Column = tsType(df) match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case TimestampType | TimestampNTZType => col("ts").cast(TimestampType)
    case other =>
      throw new IllegalStateException(
        s"events.ts has unsupported type $other — expected LongType " +
          "(legacy nanos-as-long), TimestampType, or TimestampNTZType; " +
          "did the driver regenerate testdata with a new physical type?")
  }

  /** Convenience: events with `ts` replaced by its µs-long form (the
    * as-of / range-join input shape). */
  def withTsMicros(df: DataFrame): DataFrame =
    df.withColumn("ts", tsMicros(df))

  /** Convenience: events with `ts` replaced by its TimestampType form
    * (the windowed-aggregation input shape, batch and streaming). */
  def withTsTimestamp(df: DataFrame): DataFrame =
    df.withColumn("ts", tsTimestamp(df))
}

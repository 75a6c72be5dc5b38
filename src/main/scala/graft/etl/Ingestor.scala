package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Point-in-time feature-store backfill — the reference's core incremental
  * workload (scripts/spark_ops.py:177-194 + scripts/03_feature_store.py:
  * 29-38): discover event dates in a range, then per date build the
  * feature slice (computed only from events <= date) and replace exactly
  * that `dtRef` slice of the partitioned store.
  *
  * The query is a Scala closure (date: String) => DataFrame — the
  * reference's `{date}` SQL-template substitution without string
  * formatting (SURVEY.md P5).
  *
  * Scale notes:
  *  - date discovery is an aggregation collapsed to distinct dates —
  *    driver-side list is metadata-scale (one row per event DATE);
  *  - each date's job is an independent Spark job exactly like the
  *    reference (idempotent via replaceSlice → safe to re-run/backfill);
  *  - `batchDates` amortizes scan cost by unioning consecutive date
  *    slices into one job when the per-date outputs are independent —
  *    the 100 TB lever the per-date loop lacks (same per-dtRef output
  *    contract, SURVEY.md §3.2.5).
  */
class Ingestor(
    spark: SparkSession,
    storePath: String,
    sliceCol: String = "dt_ref",
    partCol: String = "dt_year") {

  /** Sorted distinct ISO dates of `dateCol` within [start, stop]. */
  def discoverDates(events: DataFrame, dateCol: String,
                    start: String, stop: String): Seq[String] =
    events
      .select(to_date(col(dateCol)).as("dt"))
      .filter(col("dt") >= lit(start) && col("dt") <= lit(stop))
      .distinct().orderBy("dt")
      .collect().map(_.getDate(0).toString).toSeq

  /** Backfill one date: build the slice, replace it in the store. */
  def execDate(build: String => DataFrame, date: String): Unit =
    Sinks.replaceSlice(spark, build(date), storePath, sliceCol, date, partCol)

  /** Reference-exact backfill loop: one job per date, in order. */
  def execRange(build: String => DataFrame, dates: Seq[String]): Unit =
    dates.foreach(execDate(build, _))

  /** Pipelined per-date backfill (guide §2.6 — its worked example IS a
    * list of independent date partitions): materialize date i+1's
    * slice on a pool thread WHILE date i's slice is being written, so
    * the compute of the next battery back-fills the executors the
    * current write's task tail leaves idle. The WRITES stay strictly
    * sequential in date order — the store keeps its single-writer
    * contract and every replaceSlice swap is unchanged; only the
    * (idempotent, side-effect-free) slice compute overlaps. Output
    * contract identical to [[execRange]]. Each slice is persisted for
    * its write (replaceSlices re-executes its input twice — the same
    * reason it persists internally) and freed right after. */
  def execRangePipelined(build: String => DataFrame,
                         dates: Seq[String]): Unit = {
    def materialize(d: String): DataFrame = {
      val df = build(d).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
    if (dates.isEmpty) return
    var cur = materialize(dates.head)
    dates.indices.foreach { i =>
      val (next, _) = graft.core.Jobs.concurrently {
        if (i + 1 < dates.size) Some(materialize(dates(i + 1))) else None
      } {
        Sinks.replaceSlice(spark, cur, storePath, sliceCol, dates(i), partCol)
        cur.unpersist(false)
      }
      next.foreach(cur = _)
    }
  }

  /** Batched backfill: union `batch` consecutive date-slices per write.
    * Output contract identical to execRange (each row still carries its
    * own sliceCol value; all touched slices are first dropped). */
  def execBatched(build: String => DataFrame, dates: Seq[String],
                  batch: Int = 8): Unit =
    dates.grouped(math.max(batch, 1)).foreach { group =>
      val slices = group.map(build).reduce(_ unionByName _)
      Sinks.replaceSlices(spark, slices, storePath, sliceCol, group, partCol)
    }
}

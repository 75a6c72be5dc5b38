package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Backfill loop semantics (reference scripts/spark_ops.py:177-194):
  * date discovery, per-date point-in-time builds, idempotent re-runs, and
  * the batched variant matching the per-date loop's output exactly. */
class IngestorSpec extends SparkSpec {

  import spark.implicits._

  private val events = Seq(
    ("2024-01-10", "a", 1.0), ("2024-01-10", "b", 2.0),
    ("2024-02-05", "a", 3.0), ("2024-03-01", "b", 4.0),
    ("2025-01-15", "a", 5.0),
  ).toDF("dt", "key", "value")

  /** Point-in-time build: per key, count+sum of events <= date. */
  private def build(date: String): DataFrame =
    events.filter(col("dt") <= lit(date))
      .groupBy("key")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .withColumn("dt_ref", lit(date))
      .withColumn("dt_year", year(to_date(lit(date))))

  private def readStore(path: String) =
    spark.read.parquet(path)
      .select("dt_ref", "key", "n", "total", "dt_year")
      .as[(String, String, Long, Double, Int)].collect().toSet

  test("discoverDates: sorted distinct dates within range") {
    val ing = new Ingestor(spark, "unused")
    assert(ing.discoverDates(events, "dt", "2024-01-01", "2024-12-31")
      === Seq("2024-01-10", "2024-02-05", "2024-03-01"))
    assert(ing.discoverDates(events, "dt", "1900-01-01", "2030-01-01").size === 4)
  }

  test("execRange: point-in-time slices accumulate; re-run is idempotent") {
    val path = tmpDir("ing") + "/store"
    val ing = new Ingestor(spark, path)
    val dates = Seq("2024-01-10", "2024-02-05", "2024-03-01")
    ing.execRange(build, dates)
    val expected = Set(
      ("2024-01-10", "a", 1L, 1.0, 2024), ("2024-01-10", "b", 1L, 2.0, 2024),
      ("2024-02-05", "a", 2L, 4.0, 2024), ("2024-02-05", "b", 1L, 2.0, 2024),
      ("2024-03-01", "a", 2L, 4.0, 2024), ("2024-03-01", "b", 2L, 6.0, 2024))
    assert(readStore(path) === expected)
    // re-run one date (late-data style reprocess) → identical store
    ing.execDate(build, "2024-02-05")
    assert(readStore(path) === expected)
  }

  test("execBatched matches execRange output across partitions") {
    val p1 = tmpDir("ing") + "/looped"
    val p2 = tmpDir("ing") + "/batched"
    val dates = Seq("2024-01-10", "2024-02-05", "2024-03-01", "2025-01-15")
    new Ingestor(spark, p1).execRange(build, dates)
    new Ingestor(spark, p2).execBatched(build, dates, batch = 2)
    assert(readStore(p1) === readStore(p2))
    assert(readStore(p2).exists(_._5 == 2025)) // new-year partition arrived
  }
}

package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** core.EventTime must yield identical µs-domain values over every
  * physical shape `events.ts` has shipped in (legacy nanos-as-long,
  * timestamp[us] NTZ, timestamp[us] LTZ) — the driver has regenerated the
  * testdata across types once already (round 8), and whichever shape is
  * NOT currently on disk is only covered here. */
class EventTimeSpec extends SparkSpec {

  import spark.implicits._

  // two instants, µs-exact: 2024-01-01 10:00:00.123456 and +45 min
  private val usVals = Seq(1704103200123456L, 1704103200123456L + 45L * 60 * 1000000L)

  private def writeRead(prefix: String)(mk: => org.apache.spark.sql.DataFrame) = {
    val dir = tmpDir(prefix) + "/events.parquet"
    mk.write.parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val nsLong = writeRead("evt-ns") {
    usVals.map(_ * 1000L).toDF("ts") // LongType ns — the nanosAsLong shape
  }
  private lazy val ntz = writeRead("evt-ntz") {
    usVals.toDF("us").select(timestamp_micros(col("us"))
      .cast("timestamp_ntz").as("ts"))
  }
  private lazy val ltz = writeRead("evt-ltz") {
    usVals.toDF("us").select(timestamp_micros(col("us")).as("ts"))
  }

  test("tsMicros agrees across all three physical types") {
    for (df <- Seq(nsLong, ntz, ltz))
      assert(df.select(EventTime.tsMicros(df)).as[Long].collect().sorted
        === usVals.toArray, s"physical type: ${df.schema("ts").dataType}")
  }

  test("tsTimestamp agrees across all three physical types (µs-exact)") {
    for (df <- Seq(nsLong, ntz, ltz)) {
      val got = df.select(unix_micros(EventTime.tsTimestamp(df)))
        .as[Long].collect().sorted
      assert(got === usVals.toArray,
        s"physical type: ${df.schema("ts").dataType}")
      assert(df.select(EventTime.tsTimestamp(df)).schema.head.dataType
        === org.apache.spark.sql.types.TimestampType)
    }
  }

  test("tsMicros truncates (not rounds) sub-µs nanos, matching DuckDB") {
    val df = writeRead("evt-ns999") {
      Seq(usVals.head * 1000L + 999L).toDF("ts")
    }
    assert(df.select(EventTime.tsMicros(df)).as[Long].head() === usVals.head)
  }

  test("unsupported ts type fails loudly, naming expected vs found") {
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalStateException](EventTime.tsMicros(df))
    assert(e.getMessage.contains("StringType"))
    assert(e.getMessage.contains("LongType"))
  }

  test("legacy ns-long events dir: e2/e3 batch queries match the µs dir") {
    // end-to-end cover for the nanos-as-long path: restage the real
    // sf0.001 events table as LongType-ns parquet and require the
    // event-time queries to return byte-identical results from both.
    val real = "/root/testdata/sf0.001"
    val ev = Tables.t(spark, real, "events")
    val legacyDir = tmpDir("evt-legacy")
    ev.withColumn("ts", EventTime.tsMicros(ev) * 1000L)
      .write.parquet(s"$legacyDir/events.parquet")
    val legacyRead = Tables.t(spark, legacyDir, "events")
    assert(legacyRead.schema("ts").dataType
      === org.apache.spark.sql.types.LongType)
    for (q <- Seq("e2_hourly_agg", "e3_sessions", "j7_asof")) {
      val a = graft.SparkEntry.queries(q)(spark, real).collect().toSeq
      val b = graft.SparkEntry.queries(q)(spark, legacyDir).collect().toSeq
      assert(a === b, s"query $q diverges between ns-long and µs dirs")
    }
  }
}

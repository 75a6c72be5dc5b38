package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The testdata tripwire itself: green on the driver's current data, and
  * loud (naming table.column with expected-vs-found) on a synthetic
  * drift. If the driver regenerates `/root/testdata` with a type the
  * engine doesn't handle, the FIRST test here goes red with the exact
  * drift lines — no more opaque per-query gate errors (round-8 lesson). */
class SchemaCheckSpec extends SparkSpec {

  import spark.implicits._

  test("driver testdata matches the engine-supported schema (all three sf dirs)") {
    // the driver regenerates each dir; they can drift independently
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = SchemaCheck.drift(spark, s"/root/testdata/$sf")
      assert(d.isEmpty, s"TESTDATA DRIFTED under $sf:\n" + d.mkString("\n"))
    }
  }

  test("a drifted column type is reported with expected-vs-found") {
    val dir = tmpDir("drift")
    // events with ts as STRING — a shape the engine does not read
    Seq((1L, "2024-01-01T00:00:00", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val d = SchemaCheck.drift(spark, dir)
    val tsLine = d.find(_.startsWith("events.ts"))
    assert(tsLine.isDefined, s"no events.ts drift line in:\n${d.mkString("\n")}")
    assert(tsLine.get.contains("found string"))
    assert(tsLine.get.contains("bigint"))
    // the other nine tables are absent from the synthetic dir → unreadable
    assert(d.count(_.contains("unreadable")) === SchemaCheck.expected.size - 1)
  }

  test("a missing column is reported as MISSING") {
    val dir = tmpDir("missing")
    Seq((1L, 2L)).toDF("event_id", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val d = SchemaCheck.drift(spark, dir)
    assert(d.exists(l => l.startsWith("events.ts") && l.contains("MISSING")))
  }

  // Round-9 ADVICE: the type allowlist admits plain `bigint` for
  // events.ts, so a driver regen shipping epoch-µs (or ms) AS int64
  // would pass the type check silently while EventTime mis-scales every
  // event-time 1000× — the magnitude check names that drift too.
  test("bigint events.ts holding epoch-MICROSECONDS trips the magnitude check") {
    val dir = tmpDir("usdrift")
    val us = 1722470400000000L // 2024-08-01 in epoch-µs — ns/1000
    Seq((1L, us, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val d = SchemaCheck.drift(spark, dir)
    val line = d.find(_.startsWith("events.ts"))
    assert(line.isDefined, s"no magnitude drift line in:\n${d.mkString("\n")}")
    assert(line.get.contains("epoch-MICROSECONDS"), line.get)
    assert(line.get.contains("mis-scaled"), line.get)
  }

  test("bigint events.ts holding genuine epoch-ns passes the magnitude check") {
    val dir = tmpDir("nsok")
    val ns = 1722470400000000000L // 2024-08-01 in epoch-ns
    Seq((1L, ns, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val d = SchemaCheck.drift(spark, dir)
    assert(!d.exists(l => l.startsWith("events.ts")),
      s"false-positive magnitude drift:\n${d.mkString("\n")}")
  }
}

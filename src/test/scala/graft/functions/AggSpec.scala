package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The approx-percentile flag: default is exact (oracle parity); enabling
  * the flag swaps the plan to percentile_approx whose answer stays within
  * tolerance of exact — the swap a 100 TB deployment makes. */
class AggSpec extends SparkSpec {

  test("a6 median: approx flag swaps the plan; result within tolerance") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("a6_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!spark.conf.getOption(Agg.ApproxFlag).exists(_.toBoolean))
    spark.conf.set(Agg.ApproxFlag, "true")
    try {
      val df = graft.SparkEntry.queries("a6_median")(spark, dir)
      assert(df.queryExecution.analyzed.toString.contains("percentile_approx"))
      val approx = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      exact.foreach { case (k, v) =>
        assert(math.abs(approx(k) - v) <= math.max(1.0, v * 0.02),
          s"approx median for $k: ${approx(k)} vs exact $v")
      }
    } finally spark.conf.set(Agg.ApproxFlag, "false")
  }

  test("exact_percentile matches builtin percentile incl. nulls, " +
    "empty groups, and cross-partition merges") {
    import spark.implicits._
    // deterministic pseudo-random doubles + a null stripe + one group
    // whose conditional input is entirely null (empty buffer → NULL out)
    val df = spark.range(0, 10007).select(
      (col("id") % 13).as("g"),
      when(col("id") % 11 =!= 0,
        sin(col("id").cast("double")) * 1000).as("v"),
      when(col("id") % 13 =!= 12, lit(null).cast("double")).as("w"))
      .repartition(7, col("id")) // forces partial/final + serde merges
    Seq(0.0, 0.25, 0.5, 0.9, 1.0).foreach { p =>
      val got = df.groupBy("g")
        .agg(Agg.exactPercentile(col("v"), p).as("x"),
          Agg.exactPercentile(col("w"), p).as("y"))
        .orderBy("g")
        .as[(Long, Option[Double], Option[Double])].collect()
      val want = df.groupBy("g")
        .agg(percentile(col("v"), lit(p)).as("x"),
          percentile(col("w"), lit(p)).as("y"))
        .orderBy("g")
        .as[(Long, Option[Double], Option[Double])].collect()
      assert(got.length === 13)
      got.zip(want).foreach { case ((g1, x1, y1), (g2, x2, y2)) =>
        assert(g1 === g2)
        assert(y1 === y2, s"null-stripe group $g1 at p=$p")
        (x1, x2) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) <= math.abs(b) * 1e-12 + 1e-12,
              s"group $g1 p=$p: native $a vs builtin $b")
          case _ => assert(x1 === x2)
        }
      }
    }
  }

  test("DoublesBuf heap mode (window running-frame pattern) matches the " +
    "sort path at every prefix, for every interpolation shape") {
    val rnd = new scala.util.Random(42)
    Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0).foreach { p =>
      val vals = Array.fill(2000)(rnd.nextDouble() * 1000 - 500)
      val buf = new graft.plans.DoublesBuf()
      vals.zipWithIndex.foreach { case (v, i) =>
        buf.add(v) // eval→add→eval… flips the buffer into heap mode
        val got = buf.percentile(p)
        val sorted = java.util.Arrays.copyOf(vals, i + 1)
        java.util.Arrays.sort(sorted)
        val pos = p * i
        val lo = math.floor(pos).toInt
        val hi = math.ceil(pos).toInt
        val want =
          if (lo == hi) sorted(lo)
          else sorted(lo) * (1.0 - pos + lo) + sorted(hi) * (pos - lo)
        assert(got === want, s"p=$p prefix=${i + 1}")
      }
      assert(buf.size === vals.length)
    }
  }

  test("running exact median over a WIDE partition matches the builtin " +
    "windowed percentile (heap mode end-to-end through WindowExec)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // one partition of 20k rows — the shape the per-row re-sort made
    // quadratic; ties and negatives included
    val df = spark.range(0, 20000).select(
      (col("id") % 2).as("g"), col("id").as("ord"),
      round(sin(col("id").cast("double")) * 100, 1).as("v"))
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t0 = System.nanoTime()
    val got = df.withColumn("m", Agg.exactPercentile(col("v"), 0.5).over(w))
      .orderBy("g", "ord").select("m").as[Double].collect()
    val elapsed = (System.nanoTime() - t0) / 1e9
    val want = df.withColumn("m", percentile(col("v"), lit(0.5)).over(w))
      .orderBy("g", "ord").select("m").as[Double].collect()
    got.zip(want).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"row $i")
    }
    // O(n log n) sanity: 2×10k-row frames complete in seconds, not the
    // minutes the O(n² log n) re-sort path took at this width
    assert(elapsed < 60.0, s"running median took ${elapsed}s on 20k rows")
  }

  test("exact_percentile callable from SQL via session extensions") {
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      "SELECT exact_percentile(l_quantity, 0.5) AS m FROM lineitem")
      .head().getDouble(0)
    val b = spark.sql(
      "SELECT percentile(l_quantity, 0.5) AS m FROM lineitem")
      .head().getDouble(0)
    assert(r === b)
  }
}

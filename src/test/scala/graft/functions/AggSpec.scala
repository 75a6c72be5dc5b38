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
}

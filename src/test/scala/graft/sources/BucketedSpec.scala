package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located bucketed join: same key, same bucket count on both sides →
  * the join plan contains NO Exchange (shuffle) — the 100 TB recurring-
  * join layout. */
class BucketedSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed-bucketed join is Exchange-free and correct") {
    val left = (1 to 1000).map(i => (i % 50, s"l$i")).toDF("k", "lv")
    val right = (1 to 300).map(i => (i % 50, i * 1.5)).toDF("k", "rv")
    Sinks.writeBucketed(left, "graft_bl", "k", 8, sortCol = Some("k"))
    Sinks.writeBucketed(right, "graft_br", "k", 8, sortCol = Some("k"))
    try {
      // disable broadcast so the shuffle-free property is actually tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bl").join(spark.table("graft_br"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
      assert(joined.count() === (1 to 1000).map(i => i % 50)
        .map(k => (1 to 300).count(j => j % 50 == k)).sum)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bl")
      spark.sql("DROP TABLE IF EXISTS graft_br")
    }
  }
}

package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan shape assertions — the 100 TB posture is checked, not
  * assumed: filters reach the parquet scan, projections prune the read
  * schema, small sides broadcast, and the native vector expression
  * participates in whole-stage codegen. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("p5: point-in-time filter pushed to the parquet scan") {
    val p = plan("p5_pit_filter")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThan(l_shipdate") || p.contains("LessThanOrEqual(l_shipdate"),
      s"ship-date bound not pushed:\n$p")
  }

  test("p1: read schema pruned to referenced columns only") {
    val p = plan("p1_project")
    val read = p.split("ReadSchema: ")(1).split("\n")(0)
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads unreferenced columns: $read")
  }

  test("j1/j5: dimension-sized build sides broadcast (no sort-merge)") {
    assert(plan("j1_left_join_agg").contains("BroadcastHashJoin"))
    assert(plan("j5_semi_join").contains("BroadcastHashJoin"))
    assert(!plan("j5_semi_join").contains("SortMergeJoin"))
  }

  test("a6: native exact_percentile aggregate, ObjectHashAggregate, partial agg") {
    val p = plan("a6_median")
    assert(p.contains("ObjectHashAggregate"))
    assert(p.contains("exact_percentile"), s"builtin percentile still used:\n$p")
    assert(p.contains("partial_exact_percentile"), s"no partial aggregation:\n$p")
  }

  test("o4: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("o4_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("float_vec_dot: native expression in the similarity plans + correct value") {
    val df = graft.SparkEntry.queries("d6_embedding_cosine")(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("float_vec_dot"))
    // value check against a hand-computed dot
    import spark.implicits._
    val d = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
      .select(graft.functions.Vectors.dot(col("a"), col("b")).as("d"))
      .head().getDouble(0)
    assert(d === 32.0)
  }

  test("d5/d6 bounded plans: no nested-loop or cartesian join anywhere") {
    Seq("d5_ngram_jaccard", "d6_embedding_cosine").foreach { q =>
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$q plans an unbounded join:\n$p")
    }
  }

  test("d3: candidate generation shuffles only (band, hash, id) — no " +
    "array payload crosses an Exchange") {
    // The band explode replicates every doc ×4 onto both self-join sides;
    // if a shingle array rode along, shuffle bytes would scale with ~8×
    // corpus shingle volume instead of 8× (band, hash, id) triples.
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.types.ArrayType
    val cand = graft.operators.Dedup.d3Candidates(spark, dir)
    // AdaptiveSparkPlanExec is a barrier to collect(); unwrap to the
    // current physical plan underneath it
    val root = cand.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // at local SF the band self-join broadcasts and the distinct's input
    // is single-partition, so a shuffle may not exist at all — the
    // invariant is about what WOULD cross one: the join sides and any
    // exchange must carry only scalar (band, hash, id) columns
    val joins = root.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty, s"no join in candidate gen:\n$root")
    val moved = joins.flatMap(j => j.left.output ++ j.right.output) ++
      root.collect { case e: Exchange => e }.flatMap(_.output)
    val arrays = moved.filter(_.dataType.isInstanceOf[ArrayType])
    assert(arrays.isEmpty,
      s"array-typed attributes cross the band join/shuffle: " +
        s"${arrays.mkString(", ")}")
  }

  test("j9: salted plan spreads the key — salt column present pre-join") {
    val p = graft.SparkEntry.queries("j9_skew_salted")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("__salt"), s"salt column optimized away:\n$p")
  }

  test("j10: bucketed join — both scans bucketed, no exchange below the join") {
    val p = plan("j10_bucketed_join")
    assert(p.contains("Bucketed: true"), p)
    // segment from the join down to its second scan must hold no Exchange
    val start = p.indexOf("SortMergeJoin")
    assert(start >= 0, p)
    val sndScan = p.indexOf("FileScan", p.indexOf("FileScan", start) + 1)
    val seg = p.substring(start, sndScan)
    assert(!seg.contains("Exchange"), s"shuffle below the bucketed join:\n$seg")
  }

  test("IntersectCountRewrite: size(array_intersect(sorted distinct)) → " +
    "native merge count, same answer") {
    import spark.implicits._
    // parquet-backed inputs — local Seqs would be constant-folded into a
    // LocalRelation before any optimizer rule could see the pattern
    def arrays = graft.core.Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        sequence(lit(1L), (col("n_chars") % 7 + 2).cast("long")).as("x"),
        sequence((col("n_chars") % 5).cast("long"),
          ((col("n_chars") % 5) + 6).cast("long")).as("y"))
    def query = arrays.select(col("doc_id"),
      size(array_intersect(
        array_sort(array_distinct(col("x"))),
        array_sort(array_distinct(col("y"))))).as("n"))
      .orderBy("doc_id")
    val expected = query.as[(Long, Int)].collect().toSeq // built-in path
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ IntersectCountRewrite
    try {
      val df = query
      assert(df.queryExecution.optimizedPlan.toString
        .contains("sorted_intersect_count"),
        s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
      assert(df.as[(Long, Int)].collect().toSeq === expected)
      // guard: inputs not provably sorted+distinct must NOT be rewritten
      val un = arrays.select(size(array_intersect(col("x"), col("y"))).as("n"))
      assert(!un.queryExecution.optimizedPlan.toString
        .contains("sorted_intersect_count"))
    } finally spark.experimental.extraOptimizations = prev
  }

  test("float_vec_dot callable from SQL after registration") {
    org.apache.spark.sql.graftshim.registerFunctions(spark)
    val r = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
    // mixed float/double arrays also resolve
    val r2 = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(0.5 AS DOUBLE), CAST(0.25 AS DOUBLE))) AS d")
      .head().getDouble(0)
    assert(r2 === 1.0)
  }
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Profiling family invariants beyond the DuckDB oracle gate: structural
  * properties that must hold on ANY input, checked on the real sf0.001
  * testdata, plus the scale-shape assertion (single scan, no join). */
class ProfileSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("prof1: one row per profiled column; null path live on the derived column") {
    val rows = Profile.prof1Completeness(spark, dir).collect()
    assert(rows.map(_.getString(0)).sorted ===
      Array("o_custkey", "o_orderpriority", "o_orderstatus",
        "o_orderstatus_nonf"))
    val n = rows.map(r => r.getLong(1)).distinct
    assert(n.length === 1, s"n_rows must be identical per column: ${n.toSeq}")
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // physical columns are null-free in the synthetic data...
    assert(byName("o_orderstatus").getLong(2) === n.head)
    // ...the NULLIF-derived one must NOT be (F exists in o_orderstatus)
    assert(byName("o_orderstatus_nonf").getLong(2) < n.head)
    assert(byName("o_orderstatus_nonf").getLong(3)
      === byName("o_orderstatus").getLong(3) - 1)
  }

  test("prof2: stats are internally consistent per column") {
    Profile.prof2NumericStats(spark, dir).collect().foreach { r =>
      val (mn, mx, av, sd, md) = (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mn <= md && md <= mx, s"median outside [min,max] in $r")
      assert(mn <= av && av <= mx, s"avg outside [min,max] in $r")
      assert(sd >= 0.0)
    }
  }

  test("prof3: bins partition the data — counts sum to row count, ranges nest") {
    val hist = Profile.prof3Histogram(spark, dir).collect()
    val total = graft.core.Tables.t(spark, dir, "lineitem").count()
    assert(hist.map(_.getLong(2)).sum === total)
    hist.foreach { r =>
      val (lo, mn, mx) = (r.getDouble(1), r.getDouble(3), r.getDouble(4))
      assert(lo <= mn && mn <= mx && mx < lo + 100, s"bin range broken: $r")
    }
  }

  test("prof4: percentiles ordered, totals consistent, same token domain as t1") {
    val rows = Profile.prof4TokenDist(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.t(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(p50 <= p90 && p90 <= p99, s"percentiles out of order: $r")
    }
    // token domain parity with t1: totals equal sum of t1's regex counts
    val t1Total = graft.operators.TextAnalysis.t1Tokens(spark, dir)
      .agg(sum(col("n_regex_tokens").cast("long"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum === t1Total)
  }

  test("prof5: correlations bounded, identities hold, well-conditioned") {
    val rows = Profile.prof5Correlations(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    rows.values.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12, s"|r|>1: $r")
      assert(r.getLong(3) > 0)
    }
    // corr(d, 1-d) is exactly -1 up to float noise
    assert(math.abs(rows("disc_vs_keep").getDouble(1) + 1.0) < 1e-9)
    // the oracle-parity precondition the scaladoc commits to: every
    // profiled pair is well-conditioned (|r| far from 0)
    rows.values.foreach(r =>
      assert(math.abs(r.getDouble(1)) > 0.1,
        s"near-zero corr is not 6-sig-fig comparable cross-engine: $r"))
  }

  test("prof6: PSI matches an independent plain-Scala computation; " +
    "non-negative; bucket counts reconcile") {
    import org.apache.spark.sql.functions._
    val out = graft.SparkEntry.queries("prof6_drift")(spark, dir)
      .collect().map(r => r.getAs[String]("feature") -> r).toMap
    assert(out.keySet === Set("o_totalprice_b25k", "o_orderpriority"))
    // independent reference: loops over the raw rows, no Spark agg
    val rows = graft.core.Tables.t(spark, dir, "orders")
      .select(col("o_orderdate").cast("string"), col("o_totalprice"),
        col("o_orderpriority")).collect()
      .map(r => (r.getString(0) < "1998-01-01", r.getDouble(1), r.getString(2)))
    def psiOf(bucket: ((Boolean, Double, String)) => String): (Double, Int) = {
      val byB = rows.groupBy(bucket)
      val nRef = rows.count(_._1).toDouble
      val nCur = rows.size - nRef
      val psi = byB.values.map { g =>
        val p = math.max(g.count(_._1) / nRef, 1e-6)
        val q = math.max(g.count(!_._1) / nCur, 1e-6)
        (q - p) * math.log(q / p)
      }.sum
      (psi, byB.size)
    }
    val (psiNum, nbNum) = psiOf(t => "b" + math.floor(t._2 / 25000).toInt)
    val (psiCat, nbCat) = psiOf(_._3)
    for ((feat, (psi, nb)) <- Seq(
      "o_totalprice_b25k" -> ((psiNum, nbNum)),
      "o_orderpriority" -> ((psiCat, nbCat)))) {
      val r = out(feat)
      assert(r.getAs[Int]("n_buckets") === nb, feat)
      assert(r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur") === rows.size, feat)
      val got = r.getAs[Double]("psi")
      assert(got >= 0.0, s"$feat psi $got negative")
      assert(math.abs(got - psi) < 1e-5, s"$feat psi $got vs reference $psi")
    }
  }

  test("prof10: z-scores standardized, distance/z ranks agree, one row per vector") {
    val out = graft.operators.Similarity
      .queries("prof10_embedding_outliers")(spark, dir).collect()
    val n = graft.core.Tables.t(spark, dir, "embeddings").count()
    assert(out.length.toLong === n)
    val dists = out.map(_.getAs[Double]("l2_dist"))
    val zs = out.map(_.getAs[Double]("z"))
    assert(dists.forall(_ >= 0.0))
    // standardization: mean(z) ≈ 0, stddev_samp(z) ≈ 1 (6-dp rounding
    // of per-row values bounds the drift)
    val mu = zs.sum / zs.length
    val sd = math.sqrt(zs.map(z => (z - mu) * (z - mu)).sum / (zs.length - 1))
    assert(math.abs(mu) < 1e-4, s"mean(z)=$mu")
    assert(math.abs(sd - 1.0) < 1e-3, s"stddev(z)=$sd")
    // z is a monotone standardization of distance — up to the
    // independent 6-dp rounding of both columns (a dist tie at 6 dp can
    // split in z, whose scale is 1/sd larger): z sorted by dist must be
    // non-decreasing within the rounding envelope
    val muD = dists.sum / dists.length
    val sdD = math.sqrt(
      dists.map(d => (d - muD) * (d - muD)).sum / (dists.length - 1))
    val eps = 1e-6 / sdD + 2e-6 // dist-rounding amplified + z-rounding
    val zByDist = out.sortBy(r => (r.getAs[Double]("l2_dist"),
      r.getAs[Long]("vec_id"))).map(_.getAs[Double]("z"))
    zByDist.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - eps, s"z must track distance order: $a -> $b")
    }
    // the profile actually discriminates (not all rows identical)
    assert(zs.max > zs.min)
  }

  test("profiling plans stay single-scan: no join, no cartesian, one shuffle") {
    for ((name, q) <- Profile.queries) {
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$name plans a join:\n$plan")
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(plan.replace("Exchange rangepartitioning", "")).size
      assert(exchanges <= 2, // grouping + countDistinct partials at most
        s"$name shuffles $exchanges times")
    }
  }
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based semantic pins (SURVEY.md §5.2.4): Spark behaviors the
  * engine depends on, checked against independent Scala reference
  * implementations on generated data. */
class PropertiesSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic property driver: 8 samples per property from fixed
    * seeds (scalatestplus isn't resolvable offline; plain scalacheck
    * generators + explicit seeds give the same coverage, reproducibly). */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 8).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(4242L + i)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 8).foreach { i =>
      body(g1.pureApply(Gen.Parameters.default, Seed(333L + i)),
        g2.pureApply(Gen.Parameters.default, Seed(777L + i)))
    }

  private val smallInts = Gen.nonEmptyListOf(Gen.choose(-50, 150))

  /** Exact interpolating median, as the reference's PERCENTILE(x, 0.5). */
  private def refMedian(xs: Seq[Int]): Double = {
    val s = xs.sorted.map(_.toDouble)
    val pos = 0.5 * (s.length - 1)
    val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
    lo + (pos - pos.toInt) * (hi - lo)
  }

  test("percentile(x, 0.5) equals the interpolating exact median (A6)") {
    forAll(smallInts) { (xs: List[Int]) =>
      val got = xs.toDF("x")
        .agg(percentile(col("x"), lit(0.5))).head().getDouble(0)
      assert(math.abs(got - refMedian(xs)) < 1e-9)
    }
  }

  test("left_semi join equals IN-filter (J5)") {
    forAll(smallInts, smallInts) { (l: List[Int], r: List[Int]) =>
      val left = l.toDF("k")
      val right = r.toDF("k")
      val semi = left.join(right, Seq("k"), "left_semi")
        .as[Int].collect().sorted.toSeq
      val inSet = l.filter(r.toSet).sorted
      assert(semi === inSet)
    }
  }

  test("anti join equals NOT-IN on non-null keys (J6)") {
    forAll(smallInts, smallInts) { (l: List[Int], r: List[Int]) =>
      val anti = l.toDF("k").join(r.toDF("k"), Seq("k"), "left_anti")
        .as[Int].collect().sorted.toSeq
      assert(anti === l.filterNot(r.toSet).sorted)
    }
  }

  test("keep-last window dedup equals sort-then-keep-last (U3)") {
    val gen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 5), Gen.choose(0, 30), Gen.choose(-100, 100)))
    forAll(gen) { (rows: List[(Int, Int, Int)]) =>
      val df = rows.toDF("k", "ord", "v")
      val w = Window.partitionBy("k").orderBy(desc("ord"), desc("v"))
      val got = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("k", "ord", "v")
        .as[(Int, Int, Int)].collect().toSet
      val expect = rows.groupBy(_._1).map { case (_, g) =>
        g.maxBy(t => (t._2, t._3))
      }.toSet
      assert(got === expect)
    }
  }

  test("conditional aggregate equals filter-then-aggregate (A5/A7)") {
    forAll(smallInts) { (xs: List[Int]) =>
      val df = xs.toDF("x")
      val cond = col("x") % 2 === 0
      val a = df.agg(
        sum(when(cond, col("x"))).as("s"),
        avg(when(cond, col("x"))).as("a")).head()
      val evens = xs.filter(x => ((x % 2) + 2) % 2 == 0)
      if (evens.isEmpty) { assert(a.isNullAt(0) && a.isNullAt(1)) }
      else {
        assert(a.getLong(0) === evens.map(_.toLong).sum)
        assert(math.abs(a.getDouble(1) - evens.sum.toDouble / evens.size) < 1e-9)
      }
    }
  }

  test("string->double SUM coercion matches numeric sum (A11)") {
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 999))) { (xs: List[Int]) =>
      val asStrings = xs.map(x => s"$x.0")
      val got = asStrings.toDF("p")
        .agg(sum(col("p"))).head().getDouble(0)
      assert(got === xs.sum.toDouble)
    }
  }

  test("w5 rank distributions match their closed forms (W5)") {
    // pr = (rank-1)/(n-1), cd = (#rows with price <= mine)/n — the
    // definitional identities, checked per partition on real data
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.Relational.queries("w5_rank_dist")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("o_orderpriority"),
        r.getAs[Double]("o_totalprice"), r.getAs[Double]("pr"),
        r.getAs[Double]("cd"), r.getAs[Int]("dr")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, part) =>
      val n = part.length
      val prices = part.map(_._2).sorted
      part.foreach { case (_, price, pr, cd, dr) =>
        val below = prices.count(_ < price)
        val atOrBelow = prices.count(_ <= price)
        assert(pr === (if (n == 1) 0.0 else below.toDouble / (n - 1)))
        assert(cd === atOrBelow.toDouble / n)
        val distinctBelow = prices.distinct.count(_ < price)
        assert(dr === distinctBelow + 1)
      }
    }
  }

  test("a17 approx_count_distinct within HLL tolerance of exact a15 twin") {
    // a17 has NO DuckDB oracle by design (HLL++ sketches are engine-
    // specific); its gate is this tolerance check against the exact twin.
    // Default rsd = 0.05 → assert 3σ = 15% relative error per group.
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.Relational.queries(
      "a17_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.core.Tables.t(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (src, (nDocs, nd)) =>
      val (nDocsA, ndA) = approx(src)
      assert(nDocsA === nDocs) // plain count is exact in both
      val rel = math.abs(ndA - nd).toDouble / math.max(nd, 1L)
      assert(rel <= 0.15, s"source=$src approx=$ndA exact=$nd rel=$rel")
    }
  }

  test("a19 approx percentiles satisfy the sketch's RANK-error contract " +
    "against the exact data (the gate behind its rows-only driver row)") {
    // a19 has NO DuckDB oracle by design (t-digest sketches are engine-
    // specific); the contract percentile_approx documents is a RANK
    // bound: the returned value's true rank is within n/accuracy of p·n.
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.Relational.queries(
      "a19_approx_percentile")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val ps = Seq(0.5, 0.9, 0.99)
    val li = graft.core.Tables.t(spark, dir, "lineitem")
    cols.foreach { c =>
      val vals = li.select(col(c).cast("double")).collect()
        .map(_.getDouble(0)).sorted
      val n = vals.length
      val (nRows, approxPs) = out(c)
      assert(nRows === n.toLong)
      // rank tolerance: the sketch's n/accuracy, floored at one element
      val tol = math.max(n.toDouble / graft.functions.Agg.ApproxAccuracy, 1.0)
      ps.zip(approxPs).foreach { case (p, v) =>
        val atOrBelow = vals.count(_ <= v).toDouble
        val below = vals.count(_ < v).toDouble
        val target = p * n
        assert(below - tol <= target && target <= atOrBelow + tol,
          s"$c p=$p approx=$v rank window [${below}, ${atOrBelow}] " +
            s"vs target $target (n=$n tol=$tol)")
      }
    }
  }

  test("c6 alert contract: the committed PSI bands classify planted " +
    "no-drift / moderate / severe fixtures as stable / watch / alert") {
    // Planted disposition distributions over 4 funnel stages, run
    // through the EXACT engine path (TextAnalysis.funnelPsi — the c6
    // tripwire with an explicit current-side marker instead of the
    // d11 modular cut). Reference PSI values are closed-form:
    //   watch: Σ(q−p)ln(q/p) for p=[.5,.3,.15,.05], q=[.35,.35,.2,.1]
    //          = 0.110250 ∈ [0.1, 0.2)
    //   alert: q = reversed p → 2.280271 ≥ 0.2
    def rows(source: String, ref: Seq[Int], cur: Seq[Int]) =
      ref.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)((source, i + 1, false)) } ++
        cur.zipWithIndex.flatMap { case (n, i) =>
          Seq.fill(n)((source, i + 1, true)) }
    val base = Seq(50, 30, 15, 5)
    val disp = (rows("src_stable", base, base) ++
      rows("src_watch", base, Seq(35, 35, 20, 10)) ++
      rows("src_alert", base, Seq(5, 15, 30, 50)))
      .toDF("source", "stage_ord", "cur")
    val out = graft.operators.TextAnalysis.funnelPsi(disp, col("cur"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("psi"), r.getAs[String]("band")))).toMap
    assert(out("src_stable") === ((0.0, "stable")))
    assert(math.abs(out("src_watch")._1 - 0.110250) < 1e-6)
    assert(out("src_watch")._2 === "watch")
    assert(math.abs(out("src_alert")._1 - 2.280271) < 1e-6)
    assert(out("src_alert")._2 === "alert")
    // boundary rule: bands are [0, 0.1) / [0.1, 0.2) / [0.2, ∞) over
    // the ROUNDED psi — thresholds themselves land in the higher band
    val bands = Seq(0.099999, 0.1, 0.199999, 0.2).toDF("psi")
      .select(Profile.psiBandCol(col("psi")).as("band"))
      .collect().map(_.getString(0)).toSeq
    assert(bands === Seq("stable", "watch", "watch", "alert"))
  }
}

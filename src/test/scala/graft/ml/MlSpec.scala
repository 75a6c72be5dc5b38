package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ML stage semantics (SURVEY.md §2.9 / §5.2.5): exact imputation, split
  * granularity + proportions, pipeline fit/score mechanics, metric sanity,
  * and importances — metric-level, not bitwise (MLlib != sklearn trees). */
class MlSpec extends SparkSpec {

  import spark.implicits._

  private lazy val abt = graft.queries.MlQueries.abt(spark, "/root/testdata/sf0.001")
  private val features =
    Seq("n_orders", "total_spent", "avg_price", "avg_urgent_price", "n_urgent")

  test("imputer: fills NULLs with the arbitrary value, only in listed cols") {
    val df = Seq((Some(1.0), Some(2.0)), (None, None))
      .toDF("sprint_avg", "other")
    val out = new ArbitraryNumberImputer()
      .setFillValue(99.0).setInputCols(Array("sprint_avg"))
      .transform(df)
    assert(out.as[(Double, Option[Double])].collect().toSet ===
      Set((1.0, Some(2.0)), (99.0, None)))
  }

  test("imputer: unknown column fails transformSchema") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      new ArbitraryNumberImputer().setFillValue(0.0)
        .setInputCols(Array("nope")).transformSchema(df.schema)
    }
  }

  test("split: OOT year held out; keys split ~80/20; no key overlap") {
    val sp = AbtSplits.split(abt, "o_custkey", "yr", ootYear = 1998)
    assert(sp.oot.select("yr").distinct().as[Int].collect().toSeq === Seq(1998))
    assert(sp.train.filter(col("yr") >= 1998).count() === 0)
    val trainKeys = sp.train.select("o_custkey", "yr").distinct()
    val testKeys = sp.test.select("o_custkey", "yr").distinct()
    assert(trainKeys.join(testKeys, Seq("o_custkey", "yr")).count() === 0)
    val (ntr, nte) = (trainKeys.count().toDouble, testKeys.count().toDouble)
    val ratio = nte / (ntr + nte)
    assert(ratio > 0.1 && ratio < 0.3, s"test ratio $ratio outside [0.1, 0.3]")
  }

  test("pipeline: fit + score adds prediction/probability; metrics sane") {
    val sp = AbtSplits.split(abt, "o_custkey", "yr", ootYear = 1998)
    val model = ChampionModel.fit(sp.train, features,
      impute99 = Seq("avg_urgent_price"))
    val scored = ChampionModel.score(model, sp.oot)
    assert(scored.columns.contains("prediction"))
    assert(scored.columns.contains("p_champ"))
    val m = ChampionModel.evaluate(scored)
    assert(m.accuracy > 0.5 && m.accuracy <= 1.0)
    assert(m.auc >= 0.5 && m.auc <= 1.0, s"OOT AUC ${m.auc} not better than random")
    // probabilities are probabilities
    val bad = scored.filter(col("p_champ") < 0 || col("p_champ") > 1).count()
    assert(bad === 0)
  }

  test("feature importances: positive, sorted desc, sum <= 1") {
    val sp = AbtSplits.split(abt, "o_custkey", "yr", ootYear = 1998)
    val model = ChampionModel.fit(sp.train, features,
      impute99 = Seq("avg_urgent_price"))
    val imp = ChampionModel.featureImportances(model, features)
    assert(imp.nonEmpty)
    assert(imp.forall(_._2 > 0))
    assert(imp === imp.sortBy(-_._2))
    assert(imp.map(_._2).sum <= 1.0 + 1e-9)
  }

  test("golden metrics: RECORDED ACC/AUC/importances at seed 42 reproduce " +
    "exactly (SURVEY §5.2.5)") {
    // Values recorded 2026-08-12 from three independent fresh-JVM runs at
    // SPARK_GRAFT_CPUS ∈ {4, 8, 32} — bit-identical because the train
    // frame is content-hash partitioned AND sorted within partitions
    // before the fit (MLlib's bagging RNG is keyed on partition index +
    // row order). A drift here means the deterministic-fit contract broke.
    val dir = "/root/testdata/sf0.001"
    val m = graft.queries.MlQueries.model(spark, dir)
    val data = graft.queries.MlQueries.abt(spark, dir)
    val sp = AbtSplits.split(data, "o_custkey", "yr", 1998)
    val oot = ChampionModel.evaluate(ChampionModel.score(m, sp.oot))
    val te = ChampionModel.evaluate(ChampionModel.score(m, sp.test))
    assert(math.abs(oot.accuracy - 0.983050847458) < 1e-9, s"oot acc $oot")
    assert(math.abs(oot.auc - 0.998214285714) < 1e-9, s"oot auc $oot")
    assert(math.abs(te.accuracy - 0.931506849315) < 1e-9, s"test acc $te")
    assert(math.abs(te.auc - 0.986682808717) < 1e-9, s"test auc $te")
    val imp = ChampionModel.featureImportances(m, features).toMap
    assert(math.abs(imp("total_spent") - 0.791590) < 1e-5, s"imp $imp")
    assert(math.abs(imp("n_orders") - 0.166212) < 1e-5, s"imp $imp")
    assert(math.abs(imp("avg_price") - 0.038557) < 1e-5, s"imp $imp")
    assert(math.abs(imp("avg_urgent_price") - 0.003641) < 1e-5, s"imp $imp")
  }

  test("m7 quality model: trained on the annotation stage against the " +
    "m6 label rule; accuracy/AUC goldens reproduce; fit beats the " +
    "majority-class baseline") {
    // Goldens recorded 2026-08-14 from two fresh-JVM runs (the m7
    // histogram oracle pins the same fit cross-JVM at three scales);
    // determinism contract = qualityModel's content-hash partitioning.
    val dir = "/root/testdata/sf0.001"
    val scored = graft.queries.MlQueries.qualityScored(spark, dir)
    val n = scored.count().toDouble
    val acc = new org.apache.spark.ml.evaluation
      .MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(scored)
    val auc = new org.apache.spark.ml.evaluation
      .BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scored)
    val majority = math.max(
      scored.filter(col("label") === 1).count() / n,
      scored.filter(col("label") === 0).count() / n)
    info(f"m7 acc=$acc%.12f auc=$auc%.12f majority=$majority%.4f")
    // the label holds out lang_pred, so perfect separation is
    // impossible — but the features carry most of the signal
    assert(acc > majority, f"fit no better than majority $majority%.4f")
    assert(auc >= 0.85, f"auc $auc%.4f")
    assert(math.abs(acc - 0.996) < 1e-9, f"golden acc drifted: $acc%.12f")
    assert(math.abs(auc - 0.998579545455) < 1e-9,
      f"golden auc drifted: $auc%.12f")
    // Pin the fitted coefficient vector itself (rounded to 6 dp), not
    // just downstream metrics: the m7 histogram oracle assumes the
    // LBFGS fit reproduces bit-for-bit across hosts, but MLlib's
    // gradient aggregation rides BLAS (java netlib here; native on
    // other hosts) whose last-ulp results can differ — if the m7 gate
    // ever fails on a p_good value near a 0.05 bin edge, THIS assert
    // says whether the cause is fit nondeterminism (coefficients
    // drifted) or histogram plumbing (coefficients identical).
    // Recorded 2026-08-14, Spark 4.1.2 bundled netlib-java.
    val lr = graft.queries.MlQueries.qualityModel(spark, dir).stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val coefs = lr.coefficients.toArray.map(c => math.round(c * 1e6) / 1e6)
    val icept = math.round(lr.intercept * 1e6) / 1e6
    info(s"m7 coefficients=${coefs.mkString(", ")} intercept=$icept")
    val goldenCoefs = Seq(-0.362429, 2.648256, 0.0, 278.769361, 14.928165)
    val goldenIcept = -110.374174
    coefs.zip(goldenCoefs).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-6,
        f"coefficient $i drifted: $got vs golden $want — BLAS/fit " +
          "nondeterminism, not histogram plumbing")
    }
    assert(math.abs(icept - goldenIcept) < 1e-6,
      f"intercept drifted: $icept vs golden $goldenIcept")
  }

  test("u13 curriculum: positions are a permutation of 0..N-1, " +
    "monotone nonincreasing in quality; phase/shard arithmetic exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.MlQueries
      .queries("u13_quality_curriculum")(spark, dir).collect()
    val n = rows.length
    val byPos = rows.sortBy(_.getAs[Long]("curriculum_pos"))
    assert(byPos.map(_.getAs[Long]("curriculum_pos")).toSeq
      === (0L until n).toSeq, "positions not a permutation")
    // curriculum order: quality never increases along the positions
    byPos.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("p_quality") >= b.getAs[Double]("p_quality"),
        s"quality rises at pos ${b.getAs[Long]("curriculum_pos")}")
    }
    rows.foreach { r =>
      val pos = r.getAs[Long]("curriculum_pos")
      assert(r.getAs[Int]("phase") === (pos * 4 / n).toInt)
      assert(r.getAs[Int]("shard") === (pos % 8).toInt)
    }
    // phases partition the corpus into near-equal quarters
    val phaseSizes = rows.groupBy(_.getAs[Int]("phase"))
      .view.mapValues(_.length).toMap
    assert(phaseSizes.keySet === Set(0, 1, 2, 3))
    assert(phaseSizes.values.max - phaseSizes.values.min <= 1)
  }

  test("u14 trained curriculum: positions a permutation, monotone " +
    "nonincreasing in p_good, equal to the global-sort rank; the gated " +
    "cross-tab sums back to the corpus and the positive count") {
    val dir = "/root/testdata/sf0.001"
    val cur = graft.queries.MlQueries.trainedCurriculum(spark, dir).collect()
    val n = cur.length
    val byPos = cur.sortBy(_.getAs[Long]("curriculum_pos"))
    assert(byPos.map(_.getAs[Long]("curriculum_pos")).toSeq
      === (0L until n).toSeq, "positions not a permutation")
    byPos.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("p6") >= b.getAs[Double]("p6"),
        s"p_good rises at pos ${b.getAs[Long]("curriculum_pos")}")
    }
    // the banded two-level rank must EQUAL the global (p6 desc, doc_id)
    // rank — band is a monotone function of p6 (bandedCurriculum's
    // contract)
    val globalOrder = cur.sortBy(r =>
      (-r.getAs[Double]("p6"), r.getAs[Long]("doc_id")))
    assert(globalOrder.map(_.getAs[Long]("curriculum_pos")).toSeq
      === (0L until n).toSeq, "banded rank differs from the global sort")
    cur.foreach { r =>
      val pos = r.getAs[Long]("curriculum_pos")
      assert(r.getAs[Int]("phase") === (pos * 4 / n).toInt)
      assert(r.getAs[Int]("shard") === (pos % 8).toInt)
    }
    val xt = graft.queries.MlQueries
      .queries("u14_trained_curriculum")(spark, dir).collect()
    assert(xt.map(_.getAs[Long]("n_docs_cell")).sum === n.toLong)
    assert(xt.head.getAs[Long]("n_pos")
      === cur.count(_.getAs[Int]("label") === 1).toLong)
  }

  test("c4 trained curation: membership equals the independent gate " +
    "recompute (d1 keepers, English, p_good >= floor); summary sums " +
    "reconcile with the per-doc frame") {
    val dir = "/root/testdata/sf0.001"
    val kept = graft.queries.MlQueries.trainedCurationDocs(spark, dir)
      .collect()
    val keepers = graft.SparkEntry.queries("d1_exact_dedup")(spark, dir)
      .select("keeper").collect().map(_.getLong(0)).toSet
    val ann = graft.operators.TextAnalysis.annotations(spark, dir)
      .select("doc_id", "lang_pred", "n_regex_tokens").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getAs[Number]("n_regex_tokens").longValue))
      .toMap
    val p6 = graft.queries.MlQueries.trainedCurriculum(spark, dir)
      .select("doc_id", "p6").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = p6.keySet.filter(d =>
      keepers(d) && ann(d)._1 == "en" && p6(d) >= 0.5)
    assert(kept.map(_.getAs[Long]("doc_id")).toSet === want,
      "gate membership differs from the independent recompute")
    val sm = graft.queries.MlQueries
      .queries("c4_trained_curation")(spark, dir).collect()
    assert(sm.map(_.getAs[Long]("n_kept")).sum === want.size.toLong)
    assert(sm.map(_.getAs[Long]("tok_sum")).sum
      === want.toSeq.map(d => ann(d)._2).sum)
    // the gate actually bites: some docs are kept, some rejected
    assert(want.nonEmpty && want.size < p6.size)
  }

  test("golden prediction frame: m1's full scored OOT frame at seed 42 " +
    "reproduces the recorded hash (Spark-version-scoped)") {
    // Upgrades m1_rf_score beyond the driver's rows-only check: the md5
    // below pins every row of the scored frame (yr, key, label,
    // prediction, p_champ rounded to 4), not just aggregate metrics.
    // Recorded 2026-08-13 on Spark 4.1.2 from independent fresh-JVM runs
    // at SPARK_GRAFT_CPUS ∈ {4, 8, 32}; valid while the deterministic-fit
    // contract (content-hash partitioning + in-partition sort + seed 42 +
    // explicit featureSubsetStrategy) and the Spark/MLlib version hold.
    val frame = graft.queries.MlQueries.queries("m1_rf_score")(
      spark, "/root/testdata/sf0.001")
    val canon = frame.collect().map(_.toSeq.mkString(",")).mkString("\n")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5 === "f937d03874f69cf40b80e29b14429715",
      s"m1 prediction frame drifted (md5 $md5)")
  }

  // m5's histogram must be the EXACT binning of m1's per-row frame — the
  // distributional oracle and the rows-only frame can never drift apart.
  test("m5 histogram == m1 frame binned (sum of counts = OOT rows)") {
    val dir = "/root/testdata/sf0.001"
    val m1 = graft.queries.MlQueries.queries("m1_rf_score")(spark, dir)
      .select(least(floor(col("p_champ") / 0.05), lit(19.0))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n_custs"))
      .as[(Int, Long)].collect().toMap
    val m5 = graft.queries.MlQueries.queries("m5_score_histogram")(spark, dir)
      .as[(Long, Int, Long)].collect()
    assert(m5.map { case (_, b, n) => b -> n }.toMap === m1)
    val nOot = m5.head._1
    assert(m5.forall(_._1 === nOot))
    assert(m5.map(_._3).sum === nOot)
  }

  test("m8 calibration: bins partition the scored frame; aggregates " +
    "bounded and internally consistent") {
    val dir = "/root/testdata/sf0.001"
    val scored = graft.queries.MlQueries.queries("m4_logistic_score")(
      spark, dir)
    val m8 = graft.queries.MlQueries.queries("m8_calibration")(spark, dir)
      .collect()
    assert(m8.map(_.getAs[Long]("n")).sum === scored.count())
    m8.foreach { r =>
      val bin = r.getAs[Int]("bin")
      val mp = r.getAs[Double]("mean_pred")
      val pr = r.getAs[Double]("pos_rate")
      assert(bin >= 0 && bin <= 9)
      // the bin's mean prediction lies inside the bin's edges (rounding
      // slack at the boundary)
      assert(mp >= bin / 10.0 - 1e-6 && mp <= (bin + 1) / 10.0 + 1e-6,
        s"bin $bin mean_pred $mp outside its edges")
      assert(pr >= 0.0 && pr <= 1.0)
      assert(math.abs(r.getAs[Double]("gap") - (mp - pr)) < 2e-6)
    }
  }

  test("raceTable: keep-last semantics + pivot + zero fill") {
    val df = Seq(
      (2024, "a", 0.1, 1), (2024, "a", 0.9, 2), // keep ord=2 → 0.9
      (2024, "b", 0.5, 1),
      (2025, "a", 0.7, 1),
    ).toDF("yr", "ent", "p", "ord")
    val out = Scoring.raceTable(df, "yr", "ent", "p", "ord", Seq("a", "b"))
      .orderBy("yr").as[(Int, Double, Double)].collect().toSeq
    assert(out === Seq((2024, 0.9, 0.5), (2025, 0.7, 0.0)))
  }
}

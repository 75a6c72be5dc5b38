package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables.t
import graft.ml.{AbtSplits, ChampionModel, Scoring}

/** ML-surface queries (SURVEY.md §2.9) — the reference's model stage
  * (scripts/05_ml_model.py) as engine entry points over the star schema:
  * seeded OOT/key split → imputer+RF MLlib pipeline → scored frames.
  *
  * No DuckDB oracle (tree ensembles aren't SQL-expressible; the driver
  * records the weaker rows-only check). Determinism within the engine is
  * pinned by seed 42 + fixed input partitioning; metric-level assertions
  * live in MlSpec (SURVEY.md §5.2.5).
  */
object MlQueries {

  type Q = (SparkSession, String) => DataFrame

  /** ABT with deliberately-nullable feature columns (customers without
    * urgent orders have NULL urgent aggregates → the imputer battery has
    * real work, mirroring the reference's sprint columns). */
  private[graft] def abt(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders").cast("double").as("n_orders"),
        sum("o_totalprice").as("total_spent"),
        avg("o_totalprice").as("avg_price"),
        avg(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")))
          .as("avg_urgent_price"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
          .cast("double").as("n_urgent"))
    val w = Window.partitionBy("yr").orderBy(desc("total_spent"), col("o_custkey"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("fl_champ", when(col("rn") <= 20, 1).otherwise(0))
      .drop("rn")
  }

  private val features =
    Seq("n_orders", "total_spent", "avg_price", "avg_urgent_price", "n_urgent")

  /** Model registry: fit once per (session, dir) — the three ML queries
    * share one deterministic fit (seed 42), like a production model store.
    * Keyed on the session too so a fresh driver session refits.
    * Limitations (acceptable for the bench/verify lifecycle, by design):
    * entries live for the process lifetime (call `fitted.clear()` to
    * evict), and data mutated under `dir` mid-session would be served by
    * the stale model — the testdata dirs are immutable. */
  private val fitted =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      org.apache.spark.ml.PipelineModel]()

  private[graft] def model(s: SparkSession, dir: String) =
    fitted.computeIfAbsent((s, dir), { case (ss, d) =>
      val sp = AbtSplits.split(abt(ss, d), "o_custkey", "yr", 1998)
      ChampionModel.fit(sp.train, features,
        impute99 = Seq("avg_urgent_price"), impute0 = Nil)
    })

  /** M1-M7: split → fit → score the OOT year; per-row probabilities. */
  val m1RfScore: Q = (s, dir) => {
    val data = abt(s, dir)
    val sp = AbtSplits.split(data, "o_custkey", "yr", 1998)
    ChampionModel.score(model(s, dir), sp.oot)
      .select(col("yr"), col("o_custkey"), col("fl_champ"),
        col("prediction"), round(col("p_champ"), 4).as("p_champ"))
      .orderBy("o_custkey")
  }

  /** M8: feature importances of the fitted forest (>0, desc). */
  val m2FeatureImportance: Q = (s, dir) => {
    val imp = ChampionModel.featureImportances(model(s, dir), features)
    import s.implicits._
    imp.toDF("feature", "importance")
      .select(col("feature"), round(col("importance"), 4).as("importance"))
      .orderBy(desc("importance"), col("feature"))
  }

  /** M9+O4+U5: top-5 at last period + the keep-last/pivot race table for
    * those entities, unioned shapes exercised on real scored output. */
  val m3TopTrajectories: Q = (s, dir) => {
    val data = abt(s, dir)
    val scored = ChampionModel.score(model(s, dir), data)
    val top = Scoring.topAtLastPeriod(scored, "o_custkey", "yr", k = 5)
      .collect().map(_.get(0).toString).toSeq
    Scoring.trajectories(
      scored.withColumn("o_custkey", col("o_custkey").cast("string")),
      "o_custkey", "yr", top)
      .select(col("o_custkey"), col("yr"), round(col("p_pct"), 3).as("p_pct"))
      .orderBy("yr", "o_custkey")
  }

  val queries: Map[String, Q] = Map(
    "m1_rf_score" -> m1RfScore,
    "m2_feature_importance" -> m2FeatureImportance,
    "m3_top_trajectories" -> m3TopTrajectories,
  )

  /** Not SQL-expressible (tree ensemble) — rows-only driver check. */
  val oracle: Map[String, String] = Map.empty
}

package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Future-season scoring + presentation frames (reference
  * scripts/05_ml_model.py:250-448): top-k entities at the last period,
  * their probability trajectories, and the long→wide pivot used by the
  * bar-chart-race — rendering itself is out of scope (SURVEY.md M9/O4/U5);
  * these produce the exact frames the plots consume, as DataFrames.
  */
object Scoring {

  /** M9+O4: top-k entities by predicted probability at the latest period. */
  def topAtLastPeriod(scored: DataFrame, entityCol: String,
                      periodCol: String, k: Int = 5): DataFrame = {
    val last = scored.agg(max(col(periodCol))).head().get(0)
    scored.filter(col(periodCol) === lit(last))
      .orderBy(desc("p_champ"), col(entityCol))
      .limit(k)
      .select(col(entityCol), col(periodCol), col("p_champ"))
  }

  /** Probability trajectories for a set of entities (plot frame). */
  def trajectories(scored: DataFrame, entityCol: String, periodCol: String,
                   entities: Seq[String]): DataFrame =
    scored.filter(col(entityCol).isin(entities: _*))
      .select(col(entityCol), col(periodCol),
        (col("p_champ") * 100).as("p_pct"))
      .orderBy(periodCol, entityCol)

  /** U3+U5: keep-last dedup on (period, entity) by ord DESC (window — NOT
    * dropDuplicates, which keeps an arbitrary row; reference
    * scripts/05_ml_model.py:440-441 sorts then keeps last), then pivot
    * long→wide with 0-fill (the bar-chart-race table). */
  def raceTable(df: DataFrame, periodCol: String, entityCol: String,
                valueCol: String, ordCol: String,
                entities: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(periodCol, entityCol).orderBy(desc(ordCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(periodCol)
      .pivot(entityCol, entities)
      .agg(first(col(valueCol)))
      .na.fill(0)
      .orderBy(periodCol)
  }
}

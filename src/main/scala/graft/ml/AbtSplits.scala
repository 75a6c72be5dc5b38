package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test/OOT splitting at entity-period key granularity — the
  * reference's scheme (scripts/05_ml_model.py:40-87): the OOT
  * (out-of-time) year is held out entirely; remaining (entity, year)
  * KEYS are split 80/20 by a seeded uniform, then rows are recovered by
  * inner join (U4+J6). Splitting at key granularity prevents leakage of
  * an entity-year across train/test.
  *
  * Spark's rand(seed) stream differs from NumPy's RandomState — parity
  * is distributional (SURVEY.md §5.2.5), pinned per-run by the seed.
  * At scale the key frame is tiny relative to the fact table; the joins
  * broadcast.
  */
object AbtSplits {

  case class Splits(train: DataFrame, test: DataFrame, oot: DataFrame)

  def split(abt: DataFrame, entityCol: String, yearCol: String,
            ootYear: Int, testRatio: Double = 0.2,
            seed: Long = 42): Splits = {
    val oot = abt.filter(col(yearCol) === ootYear)
    val pool = abt.filter(col(yearCol) < ootYear)
    val keys = pool.select(entityCol, yearCol).dropDuplicates(
      Seq(entityCol, yearCol))
      .withColumn("r", rand(seed))
    val trainKeys = keys.filter(col("r") >= testRatio).drop("r")
    val testKeys = keys.filter(col("r") < testRatio).drop("r")
    Splits(
      train = pool.join(trainKeys, Seq(entityCol, yearCol), "inner"),
      test = pool.join(testKeys, Seq(entityCol, yearCol), "inner"),
      oot = oot)
  }
}

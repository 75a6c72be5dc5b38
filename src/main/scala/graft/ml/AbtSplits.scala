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
  * The uniform is a CONTENT hash of (entity, year, seed) — h60/2^60 —
  * not Spark's rand(seed): rand's stream is keyed on partition index, so
  * its output changes with shuffle-partition count and AQE coalescing,
  * making the "seeded" split environment-dependent. A content hash gives
  * the same split on any cluster layout (and is re-computable by the
  * DuckDB oracle). Distribution parity with NumPy's RandomState remains
  * distributional (SURVEY.md §5.2.5).
  * At scale the key frame is tiny relative to the fact table; the joins
  * broadcast.
  */
object AbtSplits {

  case class Splits(train: DataFrame, test: DataFrame, oot: DataFrame)

  /** 2^60 — h60 values are uniform in [0, 2^60). */
  private val H60Span = (1L << 60).toDouble

  def split(abt: DataFrame, entityCol: String, yearCol: String,
            ootYear: Int, testRatio: Double = 0.2,
            seed: Long = 42): Splits = {
    val oot = abt.filter(col(yearCol) === ootYear)
    val pool = abt.filter(col(yearCol) < ootYear)
    val keys = pool.select(entityCol, yearCol).dropDuplicates(
      Seq(entityCol, yearCol))
      .withColumn("r",
        graft.functions.Portable.h60(concat_ws("|",
          col(entityCol).cast("string"), col(yearCol).cast("string"),
          lit(seed))) / H60Span)
    val trainKeys = keys.filter(col("r") >= testRatio).drop("r")
    val testKeys = keys.filter(col("r") < testRatio).drop("r")
    Splits(
      train = pool.join(trainKeys, Seq(entityCol, yearCol), "inner"),
      test = pool.join(testKeys, Seq(entityCol, yearCol), "inner"),
      oot = oot)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AsOfJoin, Dedup, Multimodal, RangeJoin, Similarity, TextAnalysis, ZOrder}
import graft.queries.{Events, MlQueries, Pipeline, PointInTime, Profile, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module registries; every key has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible
  * (driver then records a weaker rows-only check).
  */
object SparkEntry {

  private[graft] val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (PointInTime.queries, PointInTime.oracle),
    (Events.queries, Events.oracle),
    (Pipeline.queries, Pipeline.oracle),
    (MlQueries.queries, MlQueries.oracle),
    (TextAnalysis.queries, TextAnalysis.oracleAll),
    (Dedup.queries, Dedup.oracle),
    (Similarity.queries, Similarity.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (AsOfJoin.queries, AsOfJoin.oracle),
    (RangeJoin.queries, RangeJoin.oracle),
    (Profile.queries, Profile.oracle),
    (ZOrder.queries, ZOrder.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}

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

  /** One registry module: name + its defining source path (for the
    * generated REGISTRY.md index) + its query/oracle maps. */
  private[graft] case class Module(
      name: String, src: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracle: Map[String, String])

  private[graft] val modules: Seq[Module] = Seq(
    Module("Relational", "src/main/scala/graft/queries/Relational.scala",
      Relational.queries, Relational.oracle),
    Module("PointInTime", "src/main/scala/graft/queries/PointInTime.scala",
      PointInTime.queries, PointInTime.oracle),
    Module("Events", "src/main/scala/graft/queries/Events.scala",
      Events.queries, Events.oracle),
    Module("Pipeline", "src/main/scala/graft/queries/Pipeline.scala",
      Pipeline.queries, Pipeline.oracle),
    Module("MlQueries", "src/main/scala/graft/queries/MlQueries.scala",
      MlQueries.queries, MlQueries.oracle),
    Module("TextAnalysis", "src/main/scala/graft/operators/TextAnalysis.scala",
      TextAnalysis.queries, TextAnalysis.oracleAll),
    Module("Dedup", "src/main/scala/graft/operators/Dedup.scala",
      Dedup.queries, Dedup.oracle),
    Module("Similarity", "src/main/scala/graft/operators/Similarity*.scala",
      Similarity.queries, Similarity.oracle),
    Module("Multimodal", "src/main/scala/graft/operators/Multimodal.scala",
      Multimodal.queries, Multimodal.oracle),
    Module("AsOfJoin", "src/main/scala/graft/operators/AsOfJoin.scala",
      AsOfJoin.queries, AsOfJoin.oracle),
    Module("RangeJoin", "src/main/scala/graft/operators/RangeJoin.scala",
      RangeJoin.queries, RangeJoin.oracle),
    Module("Profile", "src/main/scala/graft/queries/Profile.scala",
      Profile.queries, Profile.oracle),
    Module("ZOrder", "src/main/scala/graft/operators/ZOrder.scala",
      ZOrder.queries, ZOrder.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracle).reduce(_ ++ _)
}

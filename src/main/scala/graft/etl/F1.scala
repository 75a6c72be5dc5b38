package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's actual F1 pipeline, re-expressed in DataFrame form
  * (NOT a SQL-text port): bronze all-string session results → champions →
  * point-in-time driver feature store → ABT with championship labels.
  *
  * Semantics pinned to the reference (SURVEY.md §1.2, §2):
  *  - bronze columns are all strings (sources.Csv.readBronze);
  *  - positions parse via COALESCE(INT(FLOAT(x)), 99) — empty CSV cells
  *    are NULL → sentinel 99 (feature_store_drivers.sql:5-6; ANSI mode
  *    stays ON, NULL-in → NULL-out);
  *  - SUM(Points) relies on Spark's string→double coercion
  *    (champions.sql:6);
  *  - the champions join key compares int dtYear with bronze STRING year
  *    (abt_champions.sql:19-21) — Spark coercion, preserved;
  *  - exact PERCENTILE medians, incl. over CASE inputs (:46-54);
  *  - the dtRef↔dtEvent join can multiply rows when two rounds share a
  *    date (feature_store_drivers.sql:171) — preserved.
  */
object F1 {

  private def posInt(c: Column): Column =
    coalesce(c.cast("float").cast("int"), lit(99))

  /** tb_results analog (feature_store_drivers.sql:1-17): typed projection
    * + point-in-time cut at `date` (inclusive). */
  def results(bronze: DataFrame, date: String): DataFrame =
    bronze.select(
      col("DriverId"), col("TeamId"), col("identifier"),
      posInt(col("Position")).as("pos"),
      posInt(col("GridPosition")).as("grid"),
      col("Status"), col("Points"), col("Laps"),
      col("RoundNumber"), col("Location"),
      to_date(to_timestamp(col("date"))).as("dtEvent"))
      .filter(col("dtEvent") <= lit(date))

  /** One aggregate battery (feature_store_drivers.sql:30-61 and its two
    * window variants): ~15 aggregates per driver. */
  private def battery(src: DataFrame, sfx: String,
                      withTotals: Boolean): DataFrame = {
    val isRace = col("identifier") === "race"
    val isSprint = col("identifier") === "sprint"
    val gain = col("grid") - col("pos")
    val base = Seq(
      count(lit(1)).as(s"qtdRuns$sfx"),
      sum(when(isRace, 1).otherwise(0)).as(s"qtdRaces$sfx"),
      sum(when(isSprint, 1).otherwise(0)).as(s"qtdSprints$sfx"),
      sum(when(col("pos") === 1, 1).otherwise(0)).as(s"qtdWins$sfx"),
      sum(when(col("pos") <= 3, 1).otherwise(0)).as(s"qtdPodiums$sfx"),
      sum(when(col("grid") === 1, 1).otherwise(0)).as(s"qtdPoles$sfx"),
      avg(when(isRace, col("pos"))).as(s"avgPosRace$sfx"),
      avg(when(isSprint, col("pos"))).as(s"avgPosSprint$sfx"),
      percentile(when(isRace, col("pos")), lit(0.5)).as(s"medianPosRace$sfx"),
      percentile(when(isSprint, col("pos")), lit(0.5)).as(s"medianPosSprint$sfx"),
      avg(when(isRace, gain)).as(s"avgGainRace$sfx"),
      avg(when(isSprint, gain)).as(s"avgGainSprint$sfx"),
      percentile(when(isRace, gain), lit(0.5)).as(s"medianGainRace$sfx"),
      percentile(when(isSprint, gain), lit(0.5)).as(s"medianGainSprint$sfx"))
    val aggs =
      if (withTotals) base :+ sum(col("Points")).as(s"totalPoints$sfx")
      else base
    src.groupBy("DriverId").agg(aggs.head, aggs.tail: _*)
  }

  /** Point-in-time driver feature store for one reference date
    * (feature_store_drivers.sql:1-171): lifetime / trailing-year /
    * current-season batteries over drivers active in the trailing year,
    * plus the round number of the reference date. */
  def featureStore(bronze: DataFrame, date: String): DataFrame = {
    val res = results(bronze, date)
    val oneYearAgo = (to_date(lit(date)) - expr("INTERVAL 1 YEAR")).cast("date")
    val active = res.filter(col("dtEvent") >= oneYearAgo)
      .select("DriverId").distinct()

    def restricted(df: DataFrame): DataFrame =
      df.join(active, Seq("DriverId"), "left_semi")

    val life = battery(restricted(res), "", withTotals = false)
      .withColumn("dtRef", lit(date))
      .withColumn("dtYear", year(to_date(lit(date))))
    val lastYear = battery(
      restricted(res.filter(col("dtEvent") >= oneYearAgo)),
      "LastYear", withTotals = false)
    val current = battery(
      restricted(res.filter(year(col("dtEvent")) >= year(to_date(lit(date))))),
      "CurrentTemp", withTotals = true)

    // tb_event (fs.sql:19-22,171): two rounds on one date → 2 rows → the
    // reference's row multiplication, preserved.
    val events = res.select(col("dtEvent"), col("RoundNumber")).distinct()

    life
      .join(lastYear, Seq("DriverId"), "left")
      .join(current, Seq("DriverId"), "left")
      .join(events, to_date(col("dtRef")) === col("dtEvent"), "left")
      .withColumn("tempRoundNumber", col("RoundNumber"))
      .drop("dtEvent", "RoundNumber")
  }

  /** Champions per season (champions.sql): SUM(string Points) per
    * (year, DriverId), top-1 by total. */
  def champions(bronze: DataFrame): DataFrame = {
    val totals = bronze
      .groupBy(col("year"), col("DriverId"))
      .agg(sum(col("Points")).as("total_points"))
    val w = Window.partitionBy("year")
      .orderBy(desc("total_points"), col("DriverId"))
    totals.withColumn("rn_driver", row_number().over(w))
      .filter(col("rn_driver") === 1)
      .select(col("year"), col("DriverId"), col("total_points"))
  }

  /** ABT (abt_champions.sql): feature store ⟕ champions on (DriverId,
    * int dtYear = STRING year) → flChamp; reference filters + final sort. */
  def abt(fs: DataFrame, champs: DataFrame): DataFrame =
    fs.join(
      champs.select(col("DriverId").as("chDriver"), col("year").as("chYear")),
      col("DriverId") === col("chDriver") && col("dtYear") === col("chYear"),
      "left")
      .withColumn("flChamp",
        when(col("chDriver").isNotNull, 1).otherwise(0))
      .drop("chDriver", "chYear")
      .filter(col("avgPosRaceCurrentTemp").isNotNull)
      .orderBy(desc("dtRef"), col("DriverId"))
}

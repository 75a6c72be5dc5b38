package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables.t

/** The reference's silver-pipeline shapes composed end-to-end over the
  * star schema: champions (top entity per season) and the ABT (analytical
  * base table) that left-joins the champion flag onto per-(year, entity)
  * features — reference sql/champions.sql + sql/abt_champions.sql traced
  * in SURVEY.md §3.1.
  *
  * r1_abt exercises in ONE plan: 2-key group-by (A4), ranking window +
  * top-1 filter (W1/W2), LEFT join on two keys (J3), existence flag from
  * the join (J4), trivially-true conjunct + IS NOT NULL + inequality
  * filters (P7-P9), and the reference's final multi-column sort (O2).
  * Catalyst folds `1=1`, pushes the year filter to both scan branches,
  * and broadcasts the champions side (one row per year).
  */
object Pipeline {

  type Q = (SparkSession, String) => DataFrame

  /** Per-(year, custkey) feature battery — the feature_store analog the
    * ABT consumes. */
  private def features(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum("o_totalprice").as("total_spent"),
        avg("o_totalprice").as("avg_price"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
          .as("n_urgent"))

  /** Champion per year = top spender (reference champions.sql). */
  private def champions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("yr").orderBy(desc("total_spent"), col("o_custkey"))
    features(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("yr").as("ch_yr"), col("o_custkey").as("ch_cust"))
  }

  /** r1_abt: ABT = features ⟕ champions → flChamp + reference filters +
    * final sort (reference abt_champions.sql:1-28). */
  val r1Abt: Q = (s, dir) =>
    features(s, dir)
      .join(champions(s, dir),
        col("yr") === col("ch_yr") && col("o_custkey") === col("ch_cust"),
        "left")
      .select(col("yr"), col("o_custkey"), col("n_orders"),
        col("total_spent"), col("avg_price"), col("n_urgent"),
        when(col("ch_cust").isNotNull, 1).otherwise(0).as("fl_champ"))
      // P9: the reference's literal `WHERE 1=1` conjunct. Via expr(), not
      // lit(1) === lit(1): Column.=== warns "trivially true equals
      // predicate" on identical literal trees; the parsed form builds the
      // same EqualTo(1,1), which Catalyst constant-folds away either way.
      .filter(expr("1 = 1") && col("avg_price").isNotNull &&
        col("yr") < 1999)
      .orderBy(desc("yr"), col("o_custkey"))

  // ------------------------------------------------------------- r2: the F1
  // CSV pipeline INSIDE the oracle gate. The committed `;`-CSV fixture
  // (fixtures/f1_bronze, tools/gen_f1_fixture.py, seed 42) is read
  // all-string by BOTH engines (Csv.readBronze ↔ DuckDB read_csv
  // all_varchar), so the reference's coercion semantics — empty Position →
  // NULL → sentinel 99, SUM over STRING Points, int dtYear = string year
  // join, to_date(to_timestamp), shared-date row multiplication — are
  // hash-verified end-to-end, not just spec'd (reference
  // scripts/02_bronze.py:97-109, sql/champions.sql, sql/abt_champions.sql).

  private val f1Glob = "/root/repo/fixtures/f1_bronze/*.csv"
  private val f1RefDate = "2023-06-30"

  val r2F1Pipeline: Q = (s, _) => {
    val bronze = graft.sources.Csv.readBronze(s, f1Glob)
    graft.etl.F1.abt(
      graft.etl.F1.featureStore(bronze, f1RefDate),
      graft.etl.F1.champions(bronze))
  }

  /** DuckDB twin of F1.battery — the same 14(+1) aggregates per suffix. */
  private def f1BatterySql(sfx: String, withTotals: Boolean): String = {
    val isRace = "identifier = 'race'"
    val isSprint = "identifier = 'sprint'"
    val gain = "(grid - pos)"
    val base = Seq(
      s"CAST(COUNT(*) AS BIGINT) AS qtdRuns$sfx",
      s"CAST(SUM(CASE WHEN $isRace THEN 1 ELSE 0 END) AS BIGINT) AS qtdRaces$sfx",
      s"CAST(SUM(CASE WHEN $isSprint THEN 1 ELSE 0 END) AS BIGINT) AS qtdSprints$sfx",
      s"CAST(SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS qtdWins$sfx",
      s"CAST(SUM(CASE WHEN pos <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS qtdPodiums$sfx",
      s"CAST(SUM(CASE WHEN grid = 1 THEN 1 ELSE 0 END) AS BIGINT) AS qtdPoles$sfx",
      s"AVG(CASE WHEN $isRace THEN pos END) AS avgPosRace$sfx",
      s"AVG(CASE WHEN $isSprint THEN pos END) AS avgPosSprint$sfx",
      s"median(CASE WHEN $isRace THEN pos END) AS medianPosRace$sfx",
      s"median(CASE WHEN $isSprint THEN pos END) AS medianPosSprint$sfx",
      s"AVG(CASE WHEN $isRace THEN $gain END) AS avgGainRace$sfx",
      s"AVG(CASE WHEN $isSprint THEN $gain END) AS avgGainSprint$sfx",
      s"median(CASE WHEN $isRace THEN $gain END) AS medianGainRace$sfx",
      s"median(CASE WHEN $isSprint THEN $gain END) AS medianGainSprint$sfx")
    val all =
      if (withTotals) base :+
        s"SUM(CAST(Points AS DOUBLE)) AS totalPoints$sfx"
      else base
    all.mkString(",\n             ")
  }

  private def f1BatteryCols(sfx: String, withTotals: Boolean,
                            alias: String): String = {
    val names = Seq("qtdRuns", "qtdRaces", "qtdSprints", "qtdWins",
      "qtdPodiums", "qtdPoles", "avgPosRace", "avgPosSprint",
      "medianPosRace", "medianPosSprint", "avgGainRace", "avgGainSprint",
      "medianGainRace", "medianGainSprint") ++
      (if (withTotals) Seq("totalPoints") else Nil)
    names.map(n => s"$alias.$n$sfx").mkString(", ")
  }

  private def r2Oracle: String = {
    val d = f1RefDate
    s"""WITH bronze AS (
          SELECT * FROM read_csv('$f1Glob', delim=';', header=true,
                                 all_varchar=true)),
        res AS (
          SELECT DriverId, identifier,
            COALESCE(CAST(CAST(Position AS FLOAT) AS INT), 99) AS pos,
            COALESCE(CAST(CAST(GridPosition AS FLOAT) AS INT), 99) AS grid,
            Points, RoundNumber,
            CAST(CAST("date" AS TIMESTAMP) AS DATE) AS dtEvent
          FROM bronze
          WHERE CAST(CAST("date" AS TIMESTAMP) AS DATE) <= DATE '$d'),
        active AS (
          SELECT DISTINCT DriverId FROM res
          WHERE dtEvent >= CAST(DATE '$d' - INTERVAL 1 YEAR AS DATE)),
        life AS (
          SELECT DriverId,
             ${f1BatterySql("", withTotals = false)}
          FROM res WHERE DriverId IN (SELECT DriverId FROM active)
          GROUP BY 1),
        last_year AS (
          SELECT DriverId,
             ${f1BatterySql("LastYear", withTotals = false)}
          FROM res
          WHERE dtEvent >= CAST(DATE '$d' - INTERVAL 1 YEAR AS DATE)
            AND DriverId IN (SELECT DriverId FROM active)
          GROUP BY 1),
        cur AS (
          SELECT DriverId,
             ${f1BatterySql("CurrentTemp", withTotals = true)}
          FROM res
          WHERE year(dtEvent) >= year(DATE '$d')
            AND DriverId IN (SELECT DriverId FROM active)
          GROUP BY 1),
        ev AS (SELECT DISTINCT dtEvent, RoundNumber FROM res),
        champs AS (
          SELECT "year", DriverId FROM (
            SELECT "year", DriverId,
              ROW_NUMBER() OVER (PARTITION BY "year"
                ORDER BY SUM(CAST(Points AS DOUBLE)) DESC, DriverId) AS rn
            FROM bronze GROUP BY 1, 2)
          WHERE rn = 1)
        SELECT l.DriverId, ${f1BatteryCols("", withTotals = false, "l")},
          '$d' AS dtRef, CAST(year(DATE '$d') AS INT) AS dtYear,
          ${f1BatteryCols("LastYear", withTotals = false, "ly")},
          ${f1BatteryCols("CurrentTemp", withTotals = true, "c")},
          ev.RoundNumber AS tempRoundNumber,
          CASE WHEN ch.DriverId IS NOT NULL THEN 1 ELSE 0 END AS flChamp
        FROM life l
        LEFT JOIN last_year ly ON l.DriverId = ly.DriverId
        LEFT JOIN cur c ON l.DriverId = c.DriverId
        LEFT JOIN ev ON ev.dtEvent = DATE '$d'
        LEFT JOIN champs ch ON ch.DriverId = l.DriverId
          AND CAST(ch."year" AS INT) = year(DATE '$d')
        WHERE c.avgPosRaceCurrentTemp IS NOT NULL
        ORDER BY dtRef DESC, l.DriverId"""
  }

  val queries: Map[String, Q] = Map(
    "r1_abt" -> r1Abt,
    "r2_f1_pipeline" -> r2F1Pipeline,
  )

  val oracle: Map[String, String] = Map(
    "r2_f1_pipeline" -> r2Oracle,
    "r1_abt" ->
      """WITH features AS (
           SELECT CAST(year(o_orderdate) AS INT) AS yr, o_custkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(o_totalprice) AS total_spent,
             AVG(o_totalprice) AS avg_price,
             CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
           FROM orders GROUP BY 1, 2),
         champions AS (
           SELECT yr AS ch_yr, o_custkey AS ch_cust FROM (
             SELECT yr, o_custkey,
               ROW_NUMBER() OVER (PARTITION BY yr
                 ORDER BY total_spent DESC, o_custkey) AS rn
             FROM features) WHERE rn = 1)
         SELECT f.yr, f.o_custkey, f.n_orders, f.total_spent, f.avg_price,
           f.n_urgent,
           CASE WHEN c.ch_cust IS NOT NULL THEN 1 ELSE 0 END AS fl_champ
         FROM features f
         LEFT JOIN champions c ON f.yr = c.ch_yr AND f.o_custkey = c.ch_cust
         WHERE 1=1 AND f.avg_price IS NOT NULL AND f.yr < 1999
         ORDER BY f.yr DESC, f.o_custkey""",
  )
}

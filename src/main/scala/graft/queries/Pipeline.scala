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

  val queries: Map[String, Q] = Map(
    "r1_abt" -> r1Abt,
  )

  val oracle: Map[String, String] = Map(
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

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t

/** Range (interval-containment) join — points joined to intervals with
  * `lo <= pt <= hi` per key. Catalyst plans a raw inequality join as a
  * broadcast nested loop (O(|P|·|I|) comparisons); the scale composition
  * BINS both sides on a granularity >= the max interval width:
  *
  *   1. point side: bin = floor(pt / g) — one value per point;
  *   2. interval side: explode to every covered bin (<= 2 bins when the
  *      interval width <= g);
  *   3. equi-join on (key, bin) — shuffle-hash/broadcast, candidate pairs
  *      bounded by per-bin co-occupancy, not |P|·|I|;
  *   4. refine with the exact BETWEEN predicate.
  *
  * This is the standard time-attribution shape (clicks → purchase
  * windows); DuckDB's IEJoin-backed inequality join is the oracle.
  */
object RangeJoin {

  type Q = (SparkSession, String) => DataFrame

  /** Generic binned range join: points(ptCol) into intervals[loCol, hiCol]
    * (inclusive), equi keys `keys`, bin granularity `g` (same unit as the
    * point/interval columns; must be >= max interval width or covered
    * bins are missed — enforced by the caller). */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String], ptCol: String,
                        loCol: String, hiCol: String, g: Long): DataFrame = {
    // `div` = integer division: `/` is true division through double and
    // can misround at bin boundaries for large epoch values. Assumes
    // non-negative domain values (epoch times), where div == floor-div.
    val binnedPts = points.withColumn("__bin", expr(s"$ptCol div $g"))
    val binnedIvs = intervals.withColumn("__bin",
      explode(sequence(expr(s"$loCol div $g"), expr(s"$hiCol div $g"))))
    binnedPts.join(binnedIvs, keys :+ "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }

  /** J8: click→purchase attribution — every click joined to each purchase
    * window [purchase - 1h, purchase] of the same user (µs domain; DuckDB
    * truncates parquet ns timestamps to µs). A click may attribute to
    * several purchases and vice versa — the full containment relation. */
  val j8Range: Q = (s, dir) => {
    val hourUs = 3600L * 1000000L
    val ev = graft.core.EventTime.withTsMicros(t(s, dir, "events"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        (col("ts") - hourUs).as("lo"), col("ts").as("hi"))
    pointsInIntervals(clicks, windows, Seq("user_id"),
      "click_ts", "lo", "hi", g = hourUs)
      .select(col("user_id"), col("click_id"), col("p_id"),
        (col("hi") - col("click_ts")).as("gap_us"))
      .orderBy("click_id", "p_id")
  }

  val queries: Map[String, Q] = Map("j8_range" -> j8Range)

  val oracle: Map[String, String] = Map(
    "j8_range" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS p_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
           ON c.user_id = p.user_id
          AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
         ORDER BY click_id, p_id""",
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.t

/** Backward as-of join — for each left row, the most recent right row
  * with `right.ts <= left.ts` in the same key group. Spark has no native
  * ASOF operator; the idiomatic scale form is the UNION + WINDOW
  * ("piggyback") composition, NOT a range self-join:
  *
  *   1. tag both sides and union them (right payload nulled on left rows
  *      and vice versa) — no join, no row explosion;
  *   2. one window over (key) ordered by (ts, side, tiebreak):
  *      last(right-payload, ignoreNulls) carries the latest right values
  *      forward; right rows sort BEFORE left rows at equal ts so
  *      right.ts == left.ts matches (ASOF >= semantics);
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the key — at 100 TB this beats
  * any inequality-join formulation (which Catalyst can only plan as a
  * broadcast/cartesian nested loop) and never materializes candidate
  * pairs. The DuckDB oracle runs its native ASOF JOIN against this
  * composition (queries entry j7_asof).
  */
object AsOfJoin {

  type Q = (SparkSession, String) => DataFrame

  /** @param leftCols  left payload columns to keep
    * @param rightCols right payload columns to attach (renamed `asof_<c>`)
    * @param tieBreak  deterministic right-side ordering within equal
    *                  (ts, side) — pass a unique right column */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   ts: String, leftCols: Seq[String], rightCols: Seq[String],
                   tieBreak: String): DataFrame =
    asofImpl(left, right, keys, ts, leftCols, rightCols, tieBreak,
      forward = false)

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the key group: the same union+window
    * composition traversed in DESCENDING event time (the carried "last
    * seen" right is then the smallest right.ts still at-or-after the
    * left row). Same single-shuffle cost profile as the backward form. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  ts: String, leftCols: Seq[String], rightCols: Seq[String],
                  tieBreak: String): DataFrame =
    asofImpl(left, right, keys, ts, leftCols, rightCols, tieBreak,
      forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       ts: String, leftCols: Seq[String],
                       rightCols: Seq[String], tieBreak: String,
                       forward: Boolean): DataFrame = {
    // Validate before building rightOne/lU/rU: a tieBreak outside
    // rightCols would otherwise surface as an opaque unresolved-column
    // AnalysisException from rU instead of this message.
    require(rightCols.contains(tieBreak),
      s"tieBreak $tieBreak must be one of rightCols")
    // ONE deterministic right row per (keys, ts) BEFORE the union:
    // max-tieBreak wins. ASOF among duplicate right timestamps is
    // engine-unspecified (DuckDB picks arbitrarily), so the operator
    // pins the rule — and the oracle pins the same rule with a QUALIFY
    // dedup. max_by partial-aggregates map-side (combiner-friendly), so
    // the extra pass costs far less than a shuffle of the dup rows.
    val rightOne = right.groupBy((keys :+ ts).map(col): _*)
      .agg(max_by(struct(rightCols.map(col): _*), col(tieBreak)).as("__r"))
      .select((keys :+ ts).map(col) ++
        rightCols.map(c => col(s"__r.$c").as(c)): _*)
    val nullL = leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val nullR = rightCols.map(c =>
      lit(null).cast(right.schema(c).dataType).as(s"asof_$c"))
    val keyTs = (keys :+ ts).map(col)
    val lU = left.select(keyTs ++ Seq(lit(1).as("__side"),
      lit(null).cast(right.schema(tieBreak).dataType).as("__tie")) ++
      leftCols.map(col) ++ nullR: _*)
    val rU = rightOne.select(keyTs ++ Seq(lit(0).as("__side"),
      col(tieBreak).as("__tie")) ++ nullL ++
      rightCols.map(c => col(c).as(s"asof_$c")): _*)
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(lU.unionByName(rU)) { (df, c) =>
      df.withColumn(s"asof_$c",
        last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((keys :+ ts).map(col) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"asof_$c")): _*)
  }

  /** J7: purchases ⟕-as-of clicks per user on event time — each purchase
    * attached to the user's latest click at-or-before it. Oracle: DuckDB's
    * NATIVE ASOF LEFT JOIN (a true cross-engine differential: composed
    * union+window vs a purpose-built operator). */
  val j7Asof: Q = (s, dir) => {
    // µs domain on both sides — the cross-engine comparable precision
    // whatever physical ts type ships (see core.EventTime)
    val ev = graft.core.EventTime.withTsMicros(t(s, dir, "events"))
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    asofBackward(purchases, clicks, Seq("user_id"), "ts",
      leftCols = Seq("event_id", "value"),
      rightCols = Seq("click_id", "click_ts"),
      tieBreak = "click_id")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        col("value"), col("asof_click_id").as("click_id"),
        col("asof_click_ts").as("click_ts_us"))
      .orderBy("event_id")
  }

  /** J11: clicks ⟕-as-of-FORWARD purchases per user — each click
    * attached to the user's next purchase at-or-after it (the conversion
    * direction of j7's attribution). Oracle: DuckDB's native ASOF with
    * the <= comparison. */
  val j11AsofForward: Q = (s, dir) => {
    val ev = graft.core.EventTime.withTsMicros(t(s, dir, "events"))
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("ts").as("p_ts"))
    asofForward(clicks, purchases, Seq("user_id"), "ts",
      leftCols = Seq("event_id", "value"),
      rightCols = Seq("p_id", "p_ts"),
      tieBreak = "p_id")
      .select(col("event_id"), col("user_id"), col("ts").as("ts_us"),
        col("value"), col("asof_p_id").as("purchase_id"),
        col("asof_p_ts").as("purchase_ts_us"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "j7_asof" -> j7Asof,
    "j11_asof_forward" -> j11AsofForward,
  )

  val oracle: Map[String, String] = Map(
    "j7_asof" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
         c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click'
           QUALIFY row_number()
             OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    "j11_asof_forward" ->
      """SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, c.value,
         p.event_id AS purchase_id, epoch_us(p.ts) AS purchase_ts_us
         FROM (SELECT * FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase'
           QUALIFY row_number()
             OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1) p
           ON c.user_id = p.user_id AND c.ts <= p.ts
         ORDER BY c.event_id""",
  )
}

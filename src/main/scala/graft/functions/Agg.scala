package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregate helpers with scale/parity switches (SURVEY.md §7.4: "exact
  * percentile swappable for percentile_approx behind a flag; exact
  * remains default for oracle parity"). */
object Agg {

  /** Runtime flag: set `spark.graft.approxPercentile=true` to swap exact
    * medians for the t-digest approximation (single-pass mergeable sketch
    * — the 100 TB path; exact percentile buffers per-group values in an
    * ObjectHashAggregate). Default false: exact, bit-reproducible vs the
    * DuckDB oracle. */
  val ApproxFlag = "spark.graft.approxPercentile"

  /** Accuracy parameter for the approx path (1/accuracy relative error). */
  val ApproxAccuracy = 10000

  /** Exact interpolated percentile via the native
    * plans.ExactPercentile TypedImperativeAggregate (primitive double
    * buffer instead of the builtin's boxed value→count map; same
    * semantics, gated by the same oracles). */
  def exactPercentile(c: Column, p: Double): Column = {
    import org.apache.spark.sql.graftshim
    graftshim.column(graft.plans.ExactPercentile(
      graftshim.expression(c.cast("double")), p).toAggregateExpression())
  }

  def median(s: SparkSession, c: Column): Column = percentile(s, c, 0.5)

  /** Arbitrary-p percentile with the same exact-vs-t-digest swap as
    * median (exact by default for oracle parity). */
  def percentile(s: SparkSession, c: Column, p: Double): Column =
    if (s.conf.get(ApproxFlag, "false").toBoolean)
      percentile_approx(c, lit(p), lit(ApproxAccuracy))
    else exactPercentile(c, p)
}

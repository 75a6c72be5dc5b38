package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract discipline: the oracle map and the query registry
  * cannot drift apart silently. A query added without a DuckDB oracle
  * quietly downgrades to the driver's weaker rows-only check — this spec
  * forces that downgrade to be an EXPLICIT decision (the allowlist below,
  * each entry spec-gated elsewhere), and fails on orphan oracles whose
  * query was renamed or removed. */
class SparkEntrySpec extends AnyFunSuite {

  /** The only queries allowed to lack an oracle, each with its stronger
    * replacement gate: m1/m3 (RF tree-ensemble outputs — golden
    * prediction-frame hash in MlSpec), m2 (feature importances — MlSpec
    * golden values), a17 (HLL sketch values are engine-specific —
    * exact-twin bound asserted in spec). */
  private val rowsOnlyByDesign = Set(
    "m1_rf_score", "m2_feature_importance", "m3_top_trajectories",
    "a17_approx_distinct")

  test("every registry query has an oracle or is rows-only by design") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles without a query: ${o -- q}")
    assert((q -- o) === rowsOnlyByDesign,
      s"un-oracled queries beyond the documented set: ${(q -- o) -- rowsOnlyByDesign}")
  }

  test("registry names are unique across modules (no silent override)") {
    // Map ++ silently keeps the last binding on a key collision — the
    // merged sizes must equal the per-module sums.
    assert(SparkEntry.modules.map(_._1.size).sum === SparkEntry.queries.size,
      "duplicate query name across modules")
    assert(SparkEntry.modules.map(_._2.size).sum === SparkEntry.oracleSql.size,
      "duplicate oracle name across modules")
  }
}

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
    * replacement gate: m1 (the RF tree-ensemble's PER-ROW score frame —
    * genuinely not SQL-recomputable; golden prediction-frame hash in
    * MlSpec), a17 (HLL sketch values are engine-specific — exact-twin
    * bound asserted in spec), a19 (t-digest quantile sketch, no DuckDB
    * twin — rank-error bound vs the exact data asserted in
    * PropertiesSpec). m2/m3 were promoted OFF this list in round 19
    * (VERDICT r18 item 4) via the m5/m7 golden-dispatch pattern. */
  private val rowsOnlyByDesign = Set(
    "m1_rf_score", "a17_approx_distinct", "a19_approx_percentile")

  test("every registry query has an oracle or is rows-only by design") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"orphan oracles without a query: ${o -- q}")
    assert((q -- o) === rowsOnlyByDesign,
      s"un-oracled queries beyond the documented set: ${(q -- o) -- rowsOnlyByDesign}")
  }

  test("every registry query has a committed perf gate (BASELINE_GATE.json)") {
    // A query shipped without a gate is invisible to the per-query 2x
    // regression check until the next full recompute — force the gap to
    // surface at build time. Stale gate keys (renamed/removed queries)
    // fail too: they would make a future recompute_gates.py run reject
    // its input on the key-set assertion.
    val path = java.nio.file.Paths.get("BASELINE_GATE.json")
    assume(java.nio.file.Files.exists(path), "gate file not in cwd")
    val json = java.nio.file.Files.readString(path)
    // key extraction without a JSON lib: gate keys are exactly the
    // quoted strings inside the "queries" object
    val obj = json.substring(json.indexOf("\"queries\""))
    val keys = "\"([a-z0-9_]+)\":".r.findAllMatchIn(
      obj.substring(obj.indexOf('{') + 1, obj.indexOf('}')))
      .map(_.group(1)).toSet
    val q = SparkEntry.queries.keySet
    assert((q -- keys).isEmpty, s"ungated queries: ${q -- keys}")
    assert((keys -- q).isEmpty, s"stale gate keys: ${keys -- q}")
  }

  test("registry names are unique across modules (no silent override)") {
    // Map ++ silently keeps the last binding on a key collision — the
    // merged sizes must equal the per-module sums.
    assert(SparkEntry.modules.map(_.queries.size).sum === SparkEntry.queries.size,
      "duplicate query name across modules")
    assert(SparkEntry.modules.map(_.oracle.size).sum === SparkEntry.oracleSql.size,
      "duplicate oracle name across modules")
  }
}

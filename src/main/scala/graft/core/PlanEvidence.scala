package graft.core

/** Executed-plan snippets for operators whose registry frame HIDES the
  * interesting plan behind a sink read: e8's frame is a memory-table
  * scan and d12/d13's a parquet read of their verdict sink, so a plain
  * `explain` on the returned frame would audit the wrong thing (the
  * round-9 ADVICE lesson — audits must show what EXECUTED). Producers
  * record the streaming/probe plan at run time (e8: the micro-batch
  * `explainInternal`; d12/d13: the last micro-batch's probe plan);
  * tools.PlanAudit prints the recorded evidence alongside the frame's
  * own plan. Session-lifetime, last-write-wins — the audit runs the
  * query immediately before reading this, so the entry is the plan of
  * that very run.
  *
  * Fidelity caveat (round-11 advice): d12/d13's audit-mode evidence
  * RE-EXECUTES the probe (`toRdd.count()`) and records that second
  * execution's finalized plan — under AQE it can legitimately differ
  * in runtime choices (coalesced partition counts, a flipped
  * broadcast) from the plan the sink write's cloned execution actually
  * ran. The recorded plan is therefore REPRESENTATIVE of the shape
  * (same logical plan, same session state, same data) rather than the
  * literal write-side execution, and audit runs pay the probe twice
  * per micro-batch — both acceptable because the audit path is opt-in
  * (AuditProp) and never in gated runs. Capturing the write's own
  * executedPlan would need a QueryExecutionListener; revisit if a
  * shape-level divergence is ever observed in PLANS review.
  */
object PlanEvidence {

  private val m = new scala.collection.concurrent.TrieMap[String, String]()

  /** Producers that must EXECUTE a side frame purely to finalize its
    * adaptive plan for the audit (d12/d13's probe: the sink write runs
    * on a cloned execution, so the probe's own QueryExecution would
    * explain as isFinalPlan=false) gate that extra work on this flag —
    * set by tools.PlanAudit, absent in Bench/Verify so the evidence
    * pass costs nothing in gated runs. */
  val AuditProp = "graft.plan.audit"

  def auditing: Boolean = sys.props.get(AuditProp).contains("true")

  def record(name: String, plan: String): Unit = m.put(name, plan)

  def get(name: String): Option[String] = m.get(name)
}

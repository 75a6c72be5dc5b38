package graft.core

import org.apache.spark.sql.SparkSession

/** Testdata-schema tripwire (round-8 lesson): the driver regenerates
  * `/root/testdata` between rounds and has already changed a column's
  * physical type once (`events.ts` TIMESTAMP(NANOS) → timestamp[us]),
  * which surfaced only as 12 opaque per-query errors in the gate file.
  * This check reads each table's schema AS THE ENGINE SEES IT (i.e.
  * through the Sessions config, nanosAsLong included) and reports any
  * column whose type falls outside the set the engine is known to
  * handle — loudly, with expected-vs-found, before the battery runs.
  *
  * The allowlists are intentionally sets, not single types: columns the
  * engine reads adaptively (see [[EventTime]]) list every supported
  * physical shape.
  */
object SchemaCheck {

  private val ts = Set("timestamp", "timestamp_ntz")

  /** table → column → acceptable `DataType.simpleString`s. */
  private[graft] val expected: Map[String, Map[String, Set[String]]] = Map(
    "region" -> Map("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Map("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Map("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Map("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Map("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Map("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> ts, "o_orderpriority" -> Set("string")),
    "lineitem" -> Map("l_orderkey" -> Set("bigint"),
      "l_partkey" -> Set("bigint"), "l_suppkey" -> Set("bigint"),
      "l_linenumber" -> Set("int"), "l_quantity" -> Set("double"),
      "l_extendedprice" -> Set("double"), "l_discount" -> Set("double"),
      "l_tax" -> Set("double"), "l_returnflag" -> Set("string"),
      "l_linestatus" -> Set("string"), "l_shipdate" -> ts),
    "events" -> Map("event_id" -> Set("bigint"),
      // bigint = legacy nanos-as-long read of TIMESTAMP(NANOS);
      // timestamp/_ntz = the plain-µs type shipped since 2026-08-13.
      // EventTime handles all three.
      "ts" -> (ts + "bigint"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Map("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Map("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")),
  )

  /** Plausible epoch-NANOSECOND range for event timestamps: 2001-09-09
    * (1e18 ns) through ~2059 (2.8e18 ns). A bigint `events.ts` whose max
    * falls OUTSIDE this range is almost certainly epoch-µs (~1.7e15 for
    * current dates) or epoch-ms (~1.7e12) shipped as plain int64 — a
    * drift the type allowlist alone cannot see: [[EventTime]] would
    * scale every event-time 1000×/1e6× off and the failure would surface
    * only as opaque oracle hash mismatches, the exact mode this tripwire
    * exists to name. */
  private[graft] val nsLo = 1_000_000_000_000_000_000L
  private[graft] val nsHi = 2_800_000_000_000_000_000L

  /** Magnitude check for the one column whose UNIT is a convention on
    * top of its type: bigint `events.ts` must hold epoch-ns (the legacy
    * nanos-as-long read). Runs ONLY when ts is physically bigint (the
    * current driver testdata ships timestamp[us], where the unit is
    * carried by the type and this check short-circuits). The sniff reads
    * a SINGLE row — a unit error scales every value by 1000×+, so one
    * sample decides it; a min/max aggregate would scan the whole column
    * (parquet aggregate pushdown is off by default). Known blind spot:
    * one sampled row cannot see PARTIAL drift (e.g. one appended
    * µs-unit file in a mostly-ns table) — catching that would need a
    * per-file sample, which this pre-flight deliberately trades away
    * for a zero-scan start; the oracle hash gate still catches the
    * mixed case downstream, just less legibly. */
  private def tsMagnitudeDrift(spark: SparkSession, dir: String): Seq[String] =
    try {
      val ev = Tables.t(spark, dir, "events")
      // fieldNames guard: schema("ts") throws IllegalArgumentException on
      // a missing column, which the catch-all would report as a
      // misleading 'could not read data' line duplicating the table-level
      // MISSING report — absent column means nothing to sniff here.
      if (!ev.schema.fieldNames.contains("ts") ||
          ev.schema("ts").dataType.simpleString != "bigint") Nil
      // null-safe sample: getLong on a NULL ts would NPE into the
      // catch-all with the same misleading line; a null first row
      // simply decides nothing.
      else ev.select("ts").take(1).headOption
        .filterNot(_.isNullAt(0)).map(_.getLong(0)) match {
        case None => Nil // empty table or null sample: nothing to sniff
        case Some(v) if v >= nsLo && v <= nsHi => Nil
        case Some(v) =>
          def in(x: Long, lo: Long, hi: Long) = x >= lo && x <= hi
          val guess =
            if (in(v, 1_000_000_000_000_000L, 2_800_000_000_000_000L))
              "epoch-MICROSECONDS"
            else if (in(v, 1_000_000_000_000L, 2_800_000_000_000L))
              "epoch-MILLISECONDS"
            else "an unknown unit"
          Seq(s"events.ts: bigint sample value $v is outside the " +
            s"plausible epoch-ns range [$nsLo, $nsHi] — looks like $guess " +
            "shipped as int64; EventTime assumes bigint=ns, so every " +
            "event-time would be mis-scaled. Extend EventTime's LongType " +
            "branch (unit sniff) before running the battery")
      }
    } catch {
      // missing/unresolvable table → already reported by the table-level
      // checks; but a DATA read failure (footer fine, pages corrupt)
      // must not go silent — it is exactly a drift worth naming
      case _: org.apache.spark.sql.AnalysisException => Nil
      case e: Throwable =>
        Seq(s"events.ts: magnitude check could not read data " +
          s"(${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)})")
    }

  /** Every drift between `dir`'s tables and the engine-supported schema:
    * missing tables, missing columns, out-of-allowlist types, and the
    * events.ts unit-magnitude check, each as one human-readable line.
    * Empty = safe to run the battery. */
  def drift(spark: SparkSession, dir: String): Seq[String] =
    expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema =
        try Right(Tables.t(spark, dir, table).schema)
        catch { case e: Throwable => Left(e.getMessage) }
      schema match {
        case Left(err) => Seq(s"$table: unreadable ($err)")
        case Right(sc) =>
          val byName = sc.fields.map(f => f.name -> f.dataType).toMap
          cols.toSeq.sortBy(_._1).flatMap { case (c, ok) =>
            byName.get(c) match {
              case None => Some(s"$table.$c: MISSING (expected one of " +
                s"${ok.mkString("/")}; found columns ${sc.fieldNames.mkString(",")})")
              case Some(dt) if !ok.contains(dt.simpleString) =>
                Some(s"$table.$c: expected one of ${ok.mkString("/")}, " +
                  s"found ${dt.simpleString} — driver testdata drifted; " +
                  "extend the engine (see core.EventTime for the pattern) " +
                  "and this allowlist")
              case _ => None
            }
          }
      }
    } ++ tsMagnitudeDrift(spark, dir)

  /** Print any drift as an unmissable stderr banner. Returns the drift so
    * callers can choose to fail hard (specs do; Verify warns and still
    * runs the battery — untouched queries should keep their green). */
  def warn(spark: SparkSession, dir: String): Seq[String] = {
    val d = drift(spark, dir)
    if (d.nonEmpty) {
      System.err.println("=" * 72)
      System.err.println(s"[graft] TESTDATA SCHEMA DRIFT under $dir — " +
        "queries touching these columns may fail or mis-compare:")
      d.foreach(l => System.err.println(s"[graft]   $l"))
      System.err.println("=" * 72)
    }
    d
  }
}

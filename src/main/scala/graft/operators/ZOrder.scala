package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.EventTime
import graft.core.Tables.t

/** Z-ORDER (Morton-curve) multi-column layout + pruning — the missing
  * layout dimension of the store family: s25's banded store prunes on
  * ONE metadata axis; a telemetry/feature table is scanned along TWO
  * independent axes (per-entity backfills AND per-time-window audits),
  * and a single-column sort or partition layout serves only one of
  * them. Interleaving the bits of both quantized dimensions into one
  * Morton cell id co-locates rows that are close in BOTH dimensions,
  * so a rectangle predicate over (entity, time) prunes to the cells
  * the rectangle overlaps — files outside it are never listed, opened,
  * or scanned. This is the layout Delta's OPTIMIZE ZORDER BY and
  * Iceberg's sort-order z-curves implement; here it is expressed as a
  * partition-column layout so the pruning is STATIC and visible in the
  * plan (PartitionFilters), the s25 precedent.
  *
  * Geometry: [[zBits]] bits per dimension → a 2^zBits × 2^zBits cell
  * grid (64 cells at 3 bits). Quantization is pure integer arithmetic
  * — cell = (v - min) * 2^zBits div (max - min + 1) — so both engines
  * (and the spec's replayed predicate) compute bit-identical cells;
  * monotone in v, so a domain rectangle maps to a cell rectangle and
  * the residual re-check below keeps results exact (the s25FloorBand
  * lossless-pair argument, replayed in two dimensions).
  *
  * Serving splits the rectangle predicate into:
  *  - the PRUNING predicate: zcell ∈ the enumerated overlap cells —
  *    a static partition filter (the cell list is O(grid), computed
  *    driver-side from the persisted bounds row; at a production 2^20+
  *    grid a deployment computes covering Z-RANGES via BIGMIN/LITMAX
  *    splitting instead of enumerating, same contract: cells strictly
  *    outside the rectangle are never enumerated);
  *  - the exact RESIDUAL: the original user/day bounds, pushed to the
  *    parquet scan of the surviving cells (rows of a boundary cell
  *    outside the rectangle are dropped there).
  *
  * Scale shape: the layout write is one repartition on zcell (one file
  * per cell — the writeStore discipline); serving scans only the
  * overlapped cells: at 3 bits a quarter-to-half rectangle on each
  * axis keeps ~9 of 64 cells (~86% of store bytes never read), and
  * the in-cell sort (zcell, user_id, day) keeps row-group min/max
  * stats tight for the residual. The bounds row is O(1) metadata
  * persisted NEXT TO the layout (reading it back costs one tiny file,
  * not a corpus scan — the same snapshot discipline as the store
  * itself, so a reader quantizes with exactly the bounds the writer
  * used even if the corpus has since grown).
  *
  * Oracle: plain relational SQL over the raw events table with the
  * same integer-derived rectangle — the layout must be invisible to
  * results; only the plan changes (ZOrderSpec pins the pruned-scan
  * shape and row identity with the unpartitioned filter).
  */
object ZOrder {

  type Q = (SparkSession, String) => DataFrame

  /** Bits per dimension of the Morton grid (2^3 × 2^3 = 64 cells —
    * enough cells that pruning is visible at every test SF, few enough
    * that one file per cell stays healthy at sf0.001's 1k events). */
  private[operators] val zBits = 3
  private[operators] val zCells = 1 << (2 * zBits)
  private val cellsPerDim = 1 << zBits

  /** Microseconds per day — ts quantization runs on integer epoch-µs
    * (EventTime's cross-engine comparable domain; post-1970 values make
    * `div` floor-division equal to truncation in both engines). */
  private val usPerDay = 86400000000L

  /** Morton-interleave two [[zBits]]-bit cell coordinates (column
    * form): bit i of cx lands at bit 2i, bit i of cy at bit 2i+1. */
  private def interleave(cx: Column, cy: Column): Column =
    (0 until zBits).map { i =>
      (shiftleft(shiftright(cx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(cy, i).bitwiseAND(lit(1L)),
          2 * i + 1)))
    }.reduce(_.bitwiseOR(_))

  /** Integer quantizer: domain value -> cell coordinate in [0, 2^zBits).
    * SQL-expression form so the division is integer `div` (Column `/`
    * is true division through double) — the exact Long arithmetic of
    * the driver-side twin below and the oracle's `//`. */
  private def cellOf(v: String, min: String, max: String): Column =
    expr(s"(($v - $min) * $cellsPerDim) div ($max - $min + 1)")

  private def cellOf(v: Long, min: Long, max: Long): Long =
    (v - min) * cellsPerDim / (max - min + 1L)

  /** De-interleave bit i-run of a Morton id (driver-side, for the
    * overlap enumeration). */
  private def deinterleave(z: Int): (Long, Long) = {
    var cx = 0L; var cy = 0L
    (0 until zBits).foreach { i =>
      cx |= ((z >> (2 * i)) & 1).toLong << i
      cy |= ((z >> (2 * i + 1)) & 1).toLong << i
    }
    (cx, cy)
  }

  /** events with the two layout dimensions materialized: user_id and
    * the integer epoch-day of ts. */
  private def dimensioned(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // `div`, not `/`: integer floor-division on epoch-µs (post-1970 ⇒
    // floor = truncation), the EventTime cross-engine idiom
    ev.withColumn("__us", EventTime.tsMicros(ev))
      .withColumn("day", expr(s"__us div $usPerDay"))
      .drop("__us")
  }

  /** The z-layout store of a (session, dir): events partitioned by
    * Morton cell, with the writer's quantization bounds persisted as a
    * 1-row `bounds` table next to the layout. One layout build per
    * invocation through the versioned-snapshot machinery (publish on
    * success, {current, previous} retention) — the s25/s21
    * lifecycle-replay precedent: the gated entry replays the layout
    * build BY DESIGN; a deployment builds on its re-cluster cadence
    * and serves many rectangles off one published version. The data
    * write rides [[Similarity.writeStore]] (codec/block-size pinned,
    * one file per cell) with the layout's own in-partition row key. */
  private def zStore(s: SparkSession, dir: String): String =
    Similarity.buildStoreVersion(s, dir, "z1") { store =>
      val b = dimensioned(s, dir)
        .agg(min("user_id").as("min_u"), max("user_id").as("max_u"),
          min("day").as("min_d"), max("day").as("max_d"))
        .persist()
      b.coalesce(1).write.parquet(s"$store/bounds")
      val zed = dimensioned(s, dir).crossJoin(broadcast(b))
        .withColumn("zcell",
          interleave(cellOf("user_id", "min_u", "max_u"),
            cellOf("day", "min_d", "max_d")))
        .drop("min_u", "max_u", "min_d", "max_d")
      Similarity.writeStore(zed, s"$store/data", Seq("zcell"),
        rowKeyCols = Seq("user_id", "day", "event_id"))
      b.unpersist()
    }._1

  /** Query rectangle: the quarter-to-half span on BOTH dimensions —
    * integer arithmetic over the persisted bounds, so the oracle's CTE
    * derives the identical rectangle. Returns ((ulo, uhi), (dlo, dhi)). */
  private def rectangle(minU: Long, maxU: Long, minD: Long, maxD: Long)
      : ((Long, Long), (Long, Long)) = {
    val uSpan = maxU - minU + 1
    val dSpan = maxD - minD + 1
    ((minU + uSpan / 4, minU + uSpan / 2),
      (minD + dSpan / 4, minD + dSpan / 2))
  }

  /** Z1: Z-ORDER LAYOUT + TWO-DIMENSIONAL PRUNED SCAN — lay events out
    * on the Morton curve of (user_id, epoch-day), then serve a
    * rectangle query (user span × day window) as {static cell pruning}
    * + {pushed exact residual}, aggregating per user. The enumeration
    * keeps exactly the cells whose coordinate ranges intersect the
    * quantized rectangle (quantization is monotone, so rectangle
    * corners quantize to the cell-space corners). */
  val z1ZorderPrune: Q = (s, dir) => {
    val store = zStore(s, dir)
    val b = s.read.parquet(s"$store/bounds").collect()(0)
    val (minU, maxU, minD, maxD) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val ((ulo, uhi), (dlo, dhi)) = rectangle(minU, maxU, minD, maxD)
    val (cxLo, cxHi) = (cellOf(ulo, minU, maxU), cellOf(uhi, minU, maxU))
    val (cyLo, cyHi) = (cellOf(dlo, minD, maxD), cellOf(dhi, minD, maxD))
    val cells = (0 until zCells).filter { z =>
      val (cx, cy) = deinterleave(z)
      cx >= cxLo && cx <= cxHi && cy >= cyLo && cy <= cyHi
    }
    s.read.parquet(s"$store/data")
      .filter(col("zcell").isin(cells: _*) &&
        col("user_id").between(ulo, uhi) && col("day").between(dlo, dhi))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map(
    "z1_zorder_prune" -> z1ZorderPrune,
  )

  /** Z1 oracle: the raw-events rectangle aggregate with the rectangle
    * derived by the same integer arithmetic — the layout must be
    * invisible to results. */
  private val z1Sql: String =
    s"""WITH dims AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // $usPerDay
              AS day, value
          FROM events),
        b AS (
          SELECT min(user_id) AS min_u, max(user_id) AS max_u,
            min(day) AS min_d, max(day) AS max_d
          FROM dims),
        r AS (
          SELECT min_u + (max_u - min_u + 1) // 4 AS ulo,
            min_u + (max_u - min_u + 1) // 2 AS uhi,
            min_d + (max_d - min_d + 1) // 4 AS dlo,
            min_d + (max_d - min_d + 1) // 2 AS dhi
          FROM b)
        SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_events,
          round(sum(d.value), 6) AS sum_value
        FROM dims d, r
        WHERE d.user_id BETWEEN r.ulo AND r.uhi
          AND d.day BETWEEN r.dlo AND r.dhi
        GROUP BY d.user_id ORDER BY d.user_id"""

  val oracle: Map[String, String] = Map(
    "z1_zorder_prune" -> z1Sql,
  )
}

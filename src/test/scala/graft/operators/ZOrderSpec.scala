package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.EventTime

/** Z-order layout: static two-dimensional cell pruning visible in the
  * plan, residual exactness (layout invisible to results), and the
  * one-file-per-cell write discipline. */
class ZOrderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("z1: pruned rectangle scan ≡ raw-events rectangle aggregate") {
    val z = ZOrder.queries("z1_zorder_prune")(spark, dir)
    // independent recompute straight off the raw table (no layout, no
    // cells): the layout must be invisible to results
    val ev = graft.core.Tables.t(spark, dir, "events")
    val dims = ev.withColumn("__us", EventTime.tsMicros(ev))
      .withColumn("day", expr("__us div 86400000000"))
    val b = dims.agg(min("user_id"), max("user_id"),
      min("day"), max("day")).collect()(0)
    val (minU, maxU, minD, maxD) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (ulo, uhi) = (minU + (maxU - minU + 1) / 4, minU + (maxU - minU + 1) / 2)
    val (dlo, dhi) = (minD + (maxD - minD + 1) / 4, minD + (maxD - minD + 1) / 2)
    val raw = dims
      .filter(col("user_id").between(ulo, uhi) && col("day").between(dlo, dhi))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .orderBy("user_id")
    assert(z.collect().toSeq === raw.collect().toSeq)
    assert(z.count() > 0, "rectangle must select rows at sf0.001")
  }

  test("z1: plan prunes statically on zcell and pushes the residual") {
    val z = ZOrder.queries("z1_zorder_prune")(spark, dir)
    val plan = z.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // static partition pruning on the Morton cell list
    assert(plan.matches("(?s).*PartitionFilters:[^\\n]*zcell[^\\n]*IN[^\\n]*.*"),
      s"zcell IN (...) must land in PartitionFilters:\n$plan")
    // the exact residual reaches the parquet scan of surviving cells
    assert(plan.matches("(?s).*PushedFilters:[^\\n]*user_id[^\\n]*.*"),
      s"user_id residual must be pushed to the scan:\n$plan")
  }

  test("z1: layout prunes a strict majority of cells; write is one file per cell") {
    // replay the enumeration: the quarter-to-half rectangle at 3 bits
    // must keep a strict minority of the 64 cells
    // query construction builds the store eagerly (bounds + layout
    // writes happen inside z1), so the unexecuted plan is inspectable —
    // post-execution AQE re-rendering would bury the scan details
    val z = ZOrder.queries("z1_zorder_prune")(spark, dir)
    val plan = z.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // >10 values renders as INSET, fewer as IN (...)
    val inList = "zcell[^\\n]*?(?:INSET ([^\\]\\n]*)|IN \\(([^)]*)\\))".r
      .findFirstMatchIn(plan)
      .map(m => Option(m.group(1)).getOrElse(m.group(2))).getOrElse(
        fail(s"no zcell IN/INSET list in plan:\n$plan"))
    val kept = inList.split(",").length
    assert(kept < ZOrder.zCells / 2,
      s"expected a strict minority of ${ZOrder.zCells} cells, got $kept")
    // one file per cell dir (the writeStore discipline): find the store
    // via the scan's Location and count data files per zcell=* dir
    val loc = "Location:[^\\n]*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    val dataRoot = new java.io.File(
      loc.stripPrefix("file:").split(",").head)
    val cellDirs = Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("zcell="))
    assert(cellDirs.nonEmpty, s"no zcell dirs under $dataRoot")
    cellDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getName}: expected exactly 1 file, got ${files.length}")
    }
  }

  test("z2: range-predicate serving ≡ z1's INSET serving; ranges land " +
    "in PartitionFilters") {
    val z2 = ZOrder.queries("z2_zorder_ranges")(spark, dir)
    val z1 = ZOrder.queries("z1_zorder_prune")(spark, dir)
    // the predicate FORM is the only variable — results identical
    assert(z2.collect().toSeq === z1.collect().toSeq)
    val plan = z2.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the OR'd BETWEEN ranges must still prune statically on the
    // partition column (range predicates resolve against partition
    // values), and the exact residual must still reach the scan
    assert(plan.matches(
      "(?s).*PartitionFilters:[^\\n]*zcell[^\\n]*>=[^\\n]*.*"),
      s"zcell range bounds must land in PartitionFilters:\n$plan")
    assert(!plan.matches("(?s).*PartitionFilters:[^\\n]*INSET[^\\n]*.*"),
      s"z2 must prune via ranges, not an expanded INSET:\n$plan")
    assert(plan.matches("(?s).*PushedFilters:[^\\n]*user_id[^\\n]*.*"),
      s"user_id residual must be pushed to the scan:\n$plan")
  }

  // ---- BIGMIN / z-range enumeration (round-17 verdict item 5) ----

  // derived from the committed geometry (round-18 review: a hardcoded
  // bound would silently shrink the tested rectangle space if zBits
  // moves — "exhaustive" must track the dial)
  private val gMax = (1L << ZOrder.zBits) - 1
  private def inRect(z: Int, r: (Long, Long, Long, Long)): Boolean = {
    val (cx, cy) = ZOrder.deinterleave(z)
    cx >= r._1 && cx <= r._2 && cy >= r._3 && cy <= r._4
  }
  private def allRects: Seq[(Long, Long, Long, Long)] =
    for {
      xLo <- 0L to gMax; xHi <- xLo to gMax
      yLo <- 0L to gMax; yHi <- yLo to gMax
    } yield (xLo, xHi, yLo, yHi)

  test("bigmin ≡ brute-force next-in-box successor, exhaustively") {
    // every rectangle of the 8x8 grid × every OUT-of-box z-address:
    // bigmin must return the smallest in-box address > z (or fail
    // closed at -1 via the run loop's guards — brute force: -1)
    allRects.foreach { r =>
      val zmin = ZOrder.zOf(r._1, r._3)
      val zmax = ZOrder.zOf(r._2, r._4)
      (0 until ZOrder.zCells).filterNot(inRect(_, r)).foreach { z =>
        val expected = ((z + 1) until ZOrder.zCells)
          .find(inRect(_, r)).map(_.toLong).getOrElse(-1L)
        val got = ZOrder.bigmin(z.toLong, zmin, zmax)
        assert(got === expected,
          s"bigmin($z) in rect $r: got $got, expected $expected")
      }
    }
  }

  test("bigmin refuses an in-box seek origin") {
    // seeks only launch from out-of-box addresses; an in-box origin is
    // a caller bug and must fail loudly, not return something plausible
    intercept[IllegalArgumentException] {
      ZOrder.bigmin(ZOrder.zOf(2, 2), ZOrder.zOf(1, 1), ZOrder.zOf(3, 3))
    }
  }

  test("zRangesFor ≡ enumerate-and-filter, exhaustively; ranges maximal") {
    allRects.foreach { r =>
      val ranges = ZOrder.zRangesFor(r._1, r._2, r._3, r._4)
      val expanded = ranges.flatMap { case (lo, hi) => lo to hi }
      val expected = (0 until ZOrder.zCells)
        .filter(inRect(_, r)).map(_.toLong)
      assert(expanded === expected,
        s"rect $r: ranges $ranges expand to $expanded, expected $expected")
      // maximality: sorted, disjoint, and never two adjacent runs (an
      // adjacent pair would mean a missed merge — the run-end seek
      // stopped early)
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) =>
          assert(l2 > h1 + 1, s"rect $r: adjacent/overlapping runs")
        case _ => ()
      }
    }
  }
}

package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}} for the driver's
  * BENCH_r{N}.json.
  *
  * Methodology (declared in BASELINE.md §"Bench methodology"):
  *  - Timing forces FULL materialization of the query's own physical plan
  *    via queryExecution.toRdd.count() — a plain df.count() would let
  *    Catalyst prune every projected column (map-only queries like the
  *    minhash signatures would measure as a parquet row-count, i.e. ~0).
  *  - THREE passes: pass 1 runs the complete battery once, untimed, so
  *    every distinct execution path (codegen'd agg, regex, higher-order
  *    arrays, exact-percentile ObjectHashAggregate, MLlib RF fit,
  *    streaming micro-batch, parquet write jobs) pays its one-time
  *    JIT/C2/codegen/first-write cost outside the timed region; passes
  *    2-4 are timed and the reported number is the per-query MIN —
  *    steady-state, robust to transient host contention (observed 3×
  *    inflation of a single pass on shared cores). A fresh-JVM n=1
  *    single pass conflates ~2-3 min of JVM compilation with plan cost
  *    and makes real plan regressions indistinguishable from noise
  *    (round-1 lesson: 246 s cold vs 80 s steady on identical plans;
  *    round-4 lesson: with min-of-2, ONE contended pass still leaks
  *    into a handful of per-query numbers — BENCH_r04 reported 3-6×
  *    inflation on queries whose code had not changed since r03, so the
  *    min is now over THREE timed passes).
  *  - A query that throws in any timed pass is recorded with time -1.0
  *    and listed in "errors" — it never silently counts as a fast
  *    success, and the total sums successful queries only.
  */
object Bench {

  /** Host-contention calibration probe (round-9 VERDICT item 3): a FIXED
    * CPU+shuffle micro-query, independent of graft code and testdata —
    * `range(20M)` → hash-mod keys → two-column aggregate → single
    * reduction. Timed min-of-3 on the warmed JVM; its committed
    * reference value lives in BASELINE_GATE.json (`calib_ref_sec`) and
    * the ratio `calib_sec / calib_ref_sec` is the machine-readable
    * host-speed factor: per-query gate breaches that shrink under
    * time/ratio are host contention, ones that don't are real
    * regressions (interpretation rule documented in BASELINE.md §"Bench
    * methodology"). The probe's plan never changes with engine code —
    * it uses only Spark built-ins — so its time moves ONLY with the
    * host. */
  def calibrationProbe(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(20L * 1000 * 1000)
        .select((col("id") * 2654435761L % 1000003L).as("k"),
          (col("id") % 97L).as("v"))
        .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .agg(sum("sv"), max("n"))
        .queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    once() // JIT/codegen warm for the probe itself
    Seq.fill(3)(once()).min
  }

  /** IO-shaped calibration probe (round-18 verdict item 1): the CPU+
    * shuffle probe above could NOT see the uniform ~13% battery
    * inflation that hit the round-18 gate campaign (calib ≈ 1.0 while
    * the median per-query ratio read 1.13 — BASELINE.md documents the
    * episode), because that contention was filesystem/page-cache
    * shaped, not core-shaped. This probe exercises exactly that path:
    * write a seed-pinned ~100 MB parquet (id-derived md5 hex strings —
    * incompressible, so the size is stable) under a pid-suffixed
    * tmpdir, then read it fully back; timed min-of-3 on the warmed
    * JVM, dir removed afterwards. Its committed anchor lives in
    * BASELINE_GATE.json (`calib_io_ref_sec`) and the ratio
    * `calib_io_sec / calib_io_ref_sec` is the IO host factor — the
    * host-factor interpretation rule in BASELINE.md §"Bench
    * methodology" reads the PAIR: a gate campaign run is quiet only
    * when BOTH probes sit near their anchors. The probe uses only
    * Spark built-ins and fixed data, so its time moves ONLY with the
    * host's IO weather. */
  def calibrationProbeIo(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions._
    // "file:"-qualified (round-19 ADVICE): a scheme-less tmpdir path
    // resolves against fs.defaultFS, so on a non-local-FS session the
    // 'local filesystem/page-cache' probe would silently measure the
    // shared FS — the same scheme-resolution trap StoreFs.base pins.
    val dir = "file:" + sys.props("java.io.tmpdir") +
      s"/graft-calib-io-${ProcessHandle.current.pid}"
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(3L * 1000 * 1000)
        .select(col("id"),
          md5(col("id").cast("string")).as("h1"),
          md5((col("id") + 1000000007L).cast("string")).as("h2"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    try { once(); Seq.fill(3)(once()).min }
    finally graft.core.StoreFs.deleteQuietly(spark, dir)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.get()
    // same tripwire as Verify: name a driver-side schema drift loudly
    // instead of recording it as N opaque per-query errors
    graft.core.SchemaCheck.warn(spark, sfDir)
    def run(name: String): Long =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    val names = SparkEntry.queries.keys.toSeq.sorted
    // Caught-exception record (round-17 verdict item 2): BENCH_r17's
    // bounded tail capture opened mid-stack-trace with the exception
    // class truncated away — n_errors=0 proved the run recovered, but
    // the artifact could not say WHAT was caught. Every exception any
    // pass (warmup included) catches is summarized here (query → class
    // + first message line) and lands in the JSON even when the query
    // succeeds on another pass, so a tail-only capture can never hide
    // what happened.
    // Pass-tagged APPEND semantics (round-18 advice): put() overwrote,
    // so when warmup and a timed pass caught DIFFERENT exceptions for
    // the same query, the warmup one was lost, and n_caught counted
    // distinct queries rather than caught events. Now every event any
    // pass catches is kept (bounded at 4 entries/query — warmup + the
    // 3 timed passes is the natural max) and n_caught counts EVENTS.
    val caught =
      new java.util.concurrent.ConcurrentHashMap[String, List[String]]()
    def recordCaught(pass: String, name: String, e: Throwable): Unit = {
      val msg = Option(e.getMessage).getOrElse("")
        .linesIterator.nextOption().getOrElse("")
      val entry = s"$pass ${e.getClass.getName}: $msg".take(160)
      caught.merge(name, List(entry),
        (old, add) => (old ++ add).take(4))
    }
    // Pass 1: full-battery warmup (untimed as a gate basis, but PER-QUERY
    // TIMED for observability — round-19 VERDICT item 2: warmup grew
    // 489.8 → 575.6 s at sf0.1 while the battery shrank, and the fused
    // untimed pass could not say which shared artifact build moved. The
    // per-query map (warmup_queries) + warmup_top10 land in the full
    // JSON so a ceiling drift is attributable to a stage. Errors here
    // are not fatal — the timed passes record them properly.
    val t0w = System.nanoTime()
    val warmupQueries = names.map { n =>
      val t0 = System.nanoTime()
      try run(n) catch { case e: Throwable => recordCaught("warmup", n, e) }
      n -> (System.nanoTime() - t0) / 1e9
    }
    val warmupSec = (System.nanoTime() - t0w) / 1e9
    // Calibration probes run in THREE WINDOWS (round-19 VERDICT item 1):
    // the committed BENCH_r19 run proved a single post-warmup window can
    // misread — its CPU probe caught a transient spike (2.6× anchor)
    // that the 3×167-query battery never saw (battery ran 7% FASTER
    // than r18, IO probe quiet), and the host_factor = max(ratios) rule
    // would have excused a genuine ≤2.6× regression on such a run.
    // Window 0 fires after warmup (same JVM state the timed passes
    // see), windows 1-2 between the timed passes; the REPORTED
    // calib_sec / calib_io_sec are the MEDIANS of the three windows
    // (the host-factor rule reads them), the per-window arrays ride
    // along, and recompute_gates.py flags intra-run spread >1.3× as
    // "unreliable — re-run". Each window is itself min-of-3 on a
    // probe-warmed JVM (unchanged per-window methodology).
    def probeWindow(): (Double, Double) =
      (calibrationProbe(spark), calibrationProbeIo(spark))
    val w0 = probeWindow()
    // Passes 2-4: timed; report the per-query min.
    def timedPass(tag: String): Seq[(String, Double)] = names.map { name =>
      val t0 = System.nanoTime()
      val ok = try { run(name); true }
        catch { case e: Throwable => recordCaught(tag, name, e); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val pass1 = timedPass("pass1")
    val w1 = probeWindow()
    val pass2 = timedPass("pass2")
    val w2 = probeWindow()
    val pass3 = timedPass("pass3")
    val passes = Seq(pass1, pass2, pass3)
    val calibWindows = Seq(w0._1, w1._1, w2._1)
    val calibIoWindows = Seq(w0._2, w1._2, w2._2)
    def median3(xs: Seq[Double]): Double = xs.sorted.apply(1)
    val calibSec = median3(calibWindows)
    val calibIoSec = median3(calibIoWindows)
    val results = names.zipWithIndex.map { case (n, i) =>
      val ts = passes.map(_(i)._2)
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }
    val errors = results.collect { case (n, t) if t < 0 => n }
    // 3-decimal formatting keeps the single JSON line short — the driver
    // captures a bounded output window and a bloated line risks losing
    // its head to truncation (BENCH_r05 arrived tail-only, parsed:null).
    // Locale.ROOT: f"%.3f" uses the JVM default locale and would emit
    // "0,600" (invalid JSON) on comma-decimal hosts.
    def f3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // Per-pass times (not just the min) let a reader separate host
    // contention (one inflated pass) from a real regression (all passes
    // slow) without rerunning the bench.
    val passJson = names.zipWithIndex.map { case (n, i) =>
      "\"" + n + "\":[" + passes.map(p => f3(p(i)._2)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    // JSON string escaping for the caught-exception messages (arbitrary
    // text: quotes, backslashes, control chars from FS paths/SQL)
    def jstr(v: String): String = "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val caughtSorted = {
      import scala.jdk.CollectionConverters._
      caught.asScala.toSeq.sortBy(_._1)
    }
    // n_caught counts EVENTS across all passes, not distinct queries
    val nCaught = caughtSorted.map(_._2.size).sum
    def caughtJson(entries: Seq[(String, List[String])]): String =
      entries.map { case (k, vs) =>
        jstr(k) + ":" + vs.map(jstr).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    def arr(xs: Seq[Double]): String = xs.map(f3).mkString("[", ",", "]")
    val warmupJson = warmupQueries
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val warmupTop10 = warmupQueries.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val probesJson =
      s""""calib_sec":${f3(calibSec)},"calib_io_sec":${f3(calibIoSec)},"calib_windows":${arr(calibWindows)},"calib_io_windows":${arr(calibIoWindows)}"""
    val fullLine =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"passes":$passJson,"errors":$errJson,"n_caught":$nCaught,"caught":${caughtJson(caughtSorted)},"warmup_sec":${f3(warmupSec)},"warmup_queries":$warmupJson,"warmup_top10":$warmupTop10,$probesJson,"n_queries":${names.size},"sf":"$sfDir"}"""
    // The driver captures a BOUNDED stdout window (~2000 chars, tail):
    // the full 108-query map + per-pass arrays is ~6 KB, so a single fat
    // line arrives tail-only and unparseable (BENCH_r05/r08 lesson:
    // parsed:null, only ~46 of 108 timings auditable). Persist the FULL
    // payload to a stable file in the repo, and print a line guaranteed
    // to fit: per-FAMILY sums (leading letters of the query name)
    // instead of per-query, plus a pointer to the full file.
    // Default path is SUFFIXED with the sf dir's basename (round-9
    // ADVICE): an ad-hoc run at sf0.001 or on a broken build must not
    // silently clobber the curated sf0.1 artifact. The compact stdout
    // line prints `queries_file`, so the driver/judge always sees where
    // this run's full map went; promoting a run to the committed
    // BENCH_FULL.json is an explicit copy.
    val sfBase = java.nio.file.Paths.get(sfDir).getFileName.toString
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"/root/repo/BENCH_FULL_$sfBase.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(fullPath), fullLine + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullPath: $e")
    }
    val line =
      if (fullLine.length <= 1900) fullLine
      else {
        val fams = results.filter(_._2 >= 0)
          .groupBy { case (n, _) => n.takeWhile(_.isLetter) }
          .toSeq.sortBy(_._1)
          .map { case (f, rs) =>
            "\"" + f + "\":" + f3(rs.map(_._2).sum)
          }.mkString("{", ",", "}")
        // a mass-error round (r08: 12 errors) must not overflow the
        // compact line either — cap the stdout list, full list in file
        val errShown = errors.take(25)
        val errCompact = (errShown.map("\"" + _ + "\"") ++
          (if (errors.size > errShown.size)
            Seq("\"...+" + (errors.size - errShown.size) + " more\"")
          else Nil)).mkString("[", ",", "]")
        // bounded caught summary: first 3 entries, message pre-truncated
        // — the count + full map are always in queries_file
        def compactLine(caughtEntries: Seq[(String, List[String])]): String =
          s"""{"metric":"total","value":${f3(total)},"unit":"sec","family_sums":$fams,"n_errors":${errors.size},"errors":$errCompact,"n_caught":$nCaught,"caught":${caughtJson(caughtEntries)},"warmup_sec":${f3(warmupSec)},$probesJson,"n_queries":${names.size},"sf":"$sfDir","per_query_note":"full per-query map + per-pass times + warmup_queries in queries_file (stdout capture is ~2000 chars; ${names.size} entries do not fit)","queries_file":"$fullPath"}"""
        val withCaught = compactLine(
          caughtSorted.take(3).map { case (k, vs) =>
            k -> vs.take(1).map(_.take(120)) })
        // the compact line must itself fit the capture window: in a
        // mass-error round the errors list + caught samples together
        // can overflow it (round-18 review) — degrade to count-only
        // (n_caught stays; the full map is in queries_file)
        if (withCaught.length <= 1900) withCaught
        else compactLine(Seq.empty)
      }
    println(line)
    spark.stop()
  }
}

package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.SparkSpec

/** S5/S6/S7 sink semantics — especially the Delta-replaceWhere emulation:
  * slice replacement, idempotency, multi-partition slices, new-partition
  * arrival, and batched replacement (SURVEY.md §7.3 "hardest parity item"). */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  private def store(rows: (String, Int, String, Double)*) =
    rows.toDF("dt_ref", "dt_year", "key", "value")

  private def readStore(path: String) =
    spark.read.parquet(path)
      .select("dt_ref", "dt_year", "key", "value")
      .as[(String, Int, String, Double)].collect().toSet

  test("replaceSlice: first write creates a partitioned store") {
    val path = tmpDir("sinks") + "/store"
    Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 1.0)),
      path, "dt_ref", "2024-01-01", "dt_year")
    assert(readStore(path) === Set(("2024-01-01", 2024, "a", 1.0)))
    assert(Files.exists(Paths.get(path, "dt_year=2024")))
  }

  test("replaceSlice: replaces exactly the incoming slice, keeps others") {
    val path = tmpDir("sinks") + "/store"
    Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 1.0)),
      path, "dt_ref", "2024-01-01", "dt_year")
    Sinks.replaceSlice(spark, store(("2024-02-01", 2024, "a", 2.0)),
      path, "dt_ref", "2024-02-01", "dt_year")
    // re-run Feb with different content — Feb replaced, Jan untouched
    Sinks.replaceSlice(spark, store(("2024-02-01", 2024, "a", 9.0)),
      path, "dt_ref", "2024-02-01", "dt_year")
    assert(readStore(path) === Set(
      ("2024-01-01", 2024, "a", 1.0), ("2024-02-01", 2024, "a", 9.0)))
  }

  test("replaceSlice: re-running the same slice is idempotent") {
    val path = tmpDir("sinks") + "/store"
    val slice = store(("2024-01-01", 2024, "a", 1.0), ("2024-01-01", 2024, "b", 2.0))
    Sinks.replaceSlice(spark, slice, path, "dt_ref", "2024-01-01", "dt_year")
    val first = readStore(path)
    Sinks.replaceSlice(spark, slice, path, "dt_ref", "2024-01-01", "dt_year")
    assert(readStore(path) === first)
  }

  test("replaceSlice: untouched partitions are never rewritten") {
    val path = tmpDir("sinks") + "/store"
    Sinks.replaceSlice(spark, store(("2023-06-01", 2023, "x", 1.0)),
      path, "dt_ref", "2023-06-01", "dt_year")
    val dir2023 = Paths.get(path, "dt_year=2023")
    val before = Files.list(dir2023).toArray.map(_.toString).toSet
    Sinks.replaceSlice(spark, store(("2024-06-01", 2024, "y", 2.0)),
      path, "dt_ref", "2024-06-01", "dt_year")
    val after = Files.list(dir2023).toArray.map(_.toString).toSet
    assert(before === after) // 2023 partition files untouched
    assert(readStore(path) === Set(
      ("2023-06-01", 2023, "x", 1.0), ("2024-06-01", 2024, "y", 2.0)))
  }

  private def cdc(rows: (String, Int, Double, Long)*) =
    rows.toDF("key", "pt", "value", "seq")

  private def readUpsertStore(path: String) =
    spark.read.parquet(path)
      .select("key", "pt", "value")
      .as[(String, Int, Double)].collect().toSet

  test("upsert: keep-last de-batch, update vs insert, cross-partition " +
    "key move, idempotent re-run, untouched partitions never rewritten") {
    val path = tmpDir("sinks") + "/ups"
    Sinks.upsert(spark, cdc(("a", 1, 1.0, 0L), ("b", 1, 2.0, 0L),
      ("c", 2, 3.0, 0L), ("d", 3, 4.0, 0L)),
      path, Seq("key"), "seq", "pt")
    assert(readUpsertStore(path) === Set(
      ("a", 1, 1.0), ("b", 1, 2.0), ("c", 2, 3.0), ("d", 3, 4.0)))
    val dir3 = Paths.get(path, "pt=3")
    val before = Files.list(dir3).toArray.map(_.toString).toSet
    // batch: a updated twice (seq 2 wins), c MOVES to partition 1,
    // e inserted; d (partition 3) untouched
    val batch = cdc(("a", 1, 10.0, 1L), ("a", 1, 20.0, 2L),
      ("c", 1, 30.0, 1L), ("e", 2, 50.0, 1L))
    Sinks.upsert(spark, batch, path, Seq("key"), "seq", "pt")
    val want = Set(("a", 1, 20.0), ("b", 1, 2.0), ("c", 1, 30.0),
      ("d", 3, 4.0), ("e", 2, 50.0))
    assert(readUpsertStore(path) === want)
    // the stale pre-move copy of c (pt=2) is gone, not orphaned
    assert(spark.read.parquet(path).filter("key = 'c'").count() === 1)
    Sinks.upsert(spark, batch, path, Seq("key"), "seq", "pt") // re-run
    assert(readUpsertStore(path) === want)
    // the seq column is transport metadata — never lands in the table
    assert(!spark.read.parquet(path).columns.contains("seq"))
    val after = Files.list(dir3).toArray.map(_.toString).toSet
    assert(before === after) // pt=3 files untouched by either apply
  }

  test("upsert commit is crash-safe at EVERY rename boundary; readTable " +
    "serves the old snapshot mid-commit and the new table after recovery") {
    val batch = cdc(("a", 1, 10.0, 1L), ("a", 1, 20.0, 2L),
      ("c", 1, 30.0, 1L), ("e", 2, 50.0, 1L))
    def freshStore(path: String): Unit =
      Sinks.upsert(spark, cdc(("a", 1, 1.0, 0L), ("b", 1, 2.0, 0L),
        ("c", 2, 3.0, 0L), ("d", 3, 4.0, 0L)),
        path, Seq("key"), "seq", "pt")
    val preBatch = Set(("a", 1, 1.0), ("b", 1, 2.0), ("c", 2, 3.0),
      ("d", 3, 4.0))
    val postBatch = Set(("a", 1, 20.0), ("b", 1, 2.0), ("c", 1, 30.0),
      ("d", 3, 4.0), ("e", 2, 50.0))
    def snapshot(path: String) =
      Sinks.readTable(spark, path).select("key", "pt", "value")
        .as[(String, Int, Double)].collect().toSet
    var crashPoint = 0
    var crashed = true
    while (crashed) {
      val path = tmpDir("sinks") + s"/crash$crashPoint"
      freshStore(path)
      assert(snapshot(path) === preBatch)
      Sinks.crashBeforeRename = crashPoint
      crashed = try { Sinks.upsert(spark, batch, path, Seq("key"), "seq", "pt"); false }
      catch { case _: IllegalStateException => true }
      finally Sinks.crashBeforeRename = -1
      if (crashed) {
        // mid-commit: the marker is present, readTable must serve the
        // complete PRE-commit snapshot — never a partial mix
        assert(Files.exists(Paths.get(path, "_graft_commit")),
          s"crash point $crashPoint left no marker")
        assert(snapshot(path) === preBatch,
          s"mid-commit snapshot mixed at crash point $crashPoint")
        // recovery rolls forward to exactly the committed state
        assert(Sinks.recover(spark, path))
        assert(!Files.exists(Paths.get(path, "_graft_commit")))
        assert(readUpsertStore(path) === postBatch,
          s"recovery incomplete from crash point $crashPoint")
        assert(snapshot(path) === postBatch)
        // recovered store accepts further writes (auto-recover no-ops)
        Sinks.upsert(spark, batch, path, Seq("key"), "seq", "pt")
        assert(readUpsertStore(path) === postBatch)
      } else {
        assert(readUpsertStore(path) === postBatch)
      }
      crashPoint += 1
    }
    assert(crashPoint >= 4, s"expected >= 4 rename crash points, got $crashPoint")
  }

  test("crashed commit auto-recovers on the next write (no explicit recover)") {
    val path = tmpDir("sinks") + "/autorec"
    Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 1.0),
      ("2023-12-01", 2023, "z", 7.0)), path, "dt_ref", "ignored", "dt_year")
    Sinks.crashBeforeRename = 1 // crash mid-swap (after the first rename)
    try intercept[IllegalStateException] {
      Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 9.0)),
        path, "dt_ref", "2024-01-01", "dt_year")
    } finally Sinks.crashBeforeRename = -1
    // next write on the same table first rolls the crashed commit forward
    Sinks.replaceSlice(spark, store(("2023-12-01", 2023, "z", 8.0)),
      path, "dt_ref", "2023-12-01", "dt_year")
    assert(readStore(path) === Set(
      ("2024-01-01", 2024, "a", 9.0), ("2023-12-01", 2023, "z", 8.0)))
    assert(!Files.exists(Paths.get(path, "_graft_commit")))
  }

  test("sinks reject null and fractional partition values up front") {
    val path = tmpDir("sinks") + "/bad"
    val nullPart = Seq(("2024-01-01", Option.empty[Int], "a", 1.0))
      .toDF("dt_ref", "dt_year", "key", "value")
    Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 1.0)),
      path, "dt_ref", "2024-01-01", "dt_year")
    intercept[IllegalArgumentException] {
      Sinks.replaceSlice(spark, nullPart, path, "dt_ref", "2024-01-01", "dt_year")
    }
    val doublePart = Seq(("2024-01-01", 2024.0, "a", 1.0))
      .toDF("dt_ref", "dt_year", "key", "value")
    intercept[IllegalArgumentException] {
      Sinks.replaceSlice(spark, doublePart, path + "2", "dt_ref",
        "2024-01-01", "dt_year")
    }
  }

  test("replaceSlices: batched replacement drops all incoming slice values") {
    val path = tmpDir("sinks") + "/store"
    Sinks.replaceSlices(spark,
      store(("2024-01-01", 2024, "a", 1.0), ("2024-02-01", 2024, "b", 2.0)),
      path, "dt_ref", Seq("2024-01-01", "2024-02-01"), "dt_year")
    Sinks.replaceSlices(spark,
      store(("2024-01-01", 2024, "a", 5.0), ("2024-03-01", 2024, "c", 3.0)),
      path, "dt_ref", Seq("2024-01-01", "2024-03-01"), "dt_year")
    assert(readStore(path) === Set(
      ("2024-01-01", 2024, "a", 5.0), ("2024-02-01", 2024, "b", 2.0),
      ("2024-03-01", 2024, "c", 3.0)))
  }

  test("store reads partition-prune on dt_year (PruneFileSourcePartitions)") {
    val path = tmpDir("sinks") + "/store"
    Sinks.replaceSlice(spark, store(("2023-06-01", 2023, "x", 1.0)),
      path, "dt_ref", "2023-06-01", "dt_year")
    Sinks.replaceSlice(spark, store(("2024-06-01", 2024, "y", 2.0)),
      path, "dt_ref", "2024-06-01", "dt_year")
    val q = spark.read.parquet(path).filter(org.apache.spark.sql.functions.col("dt_year") === 2024)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters")(1).split("\n")(0).contains("dt_year"),
      s"partition filter not pruned:\n$plan")
    assert(q.count() === 1)
  }

  test("vacuum: planted victims deleted, planted survivors kept — the " +
    "standing rule for delete-by-pattern code (round-12 tmp-sweep lesson)") {
    val base = tmpDir("sinks")
    val path = base + "/store"
    Sinks.replaceSlice(spark, store(("2024-01-01", 2024, "a", 1.0)),
      path, "dt_ref", "2024-01-01", "dt_year")
    val before = readStore(path)
    val old = System.currentTimeMillis() - 7200 * 1000L
    def mk(p: String, mtime: Long): java.io.File = {
      val f = new java.io.File(p)
      f.mkdirs()
      Files.writeString(Paths.get(p, "part-0"), "x")
      assert(f.setLastModified(mtime))
      f
    }
    // victims: an aged orphan staging dir + an aged _graft_old archive
    val victimStaging = mk(s"$path-staging-dead1", old)
    val victimOld = mk(s"$path/_graft_old/tx1", old)
    // survivors: a YOUNG staging dir (may belong to an in-flight
    // writer), a sibling whose name misses the pattern, a YOUNG archive
    val freshStaging = mk(s"$path-staging-live1", System.currentTimeMillis())
    val foreign = mk(s"$base/store-other", old)
    val freshOld = mk(s"$path/_graft_old/tx2", System.currentTimeMillis())
    val removed = Sinks.vacuum(spark, path)
    assert(removed === 2, s"removed=$removed")
    assert(!victimStaging.exists(), "aged staging victim survived")
    assert(!victimOld.exists(), "aged archive victim survived")
    assert(freshStaging.exists(), "young staging dir was deleted")
    assert(foreign.exists(), "non-matching sibling was deleted")
    assert(freshOld.exists(), "young archive was deleted")
    assert(readStore(path) === before, "vacuum touched live table data")
    // marker present -> recovery owns _graft_old: vacuum must not touch
    // it even when aged
    val agedUnderMarker = mk(s"$path/_graft_old/tx3", old)
    Files.writeString(Paths.get(path, "_graft_commit"), "{}")
    try {
      assert(Sinks.vacuum(spark, path) === 0)
      assert(agedUnderMarker.exists(),
        "vacuum deleted an archive owned by a pending commit")
    } finally Files.delete(Paths.get(path, "_graft_commit"))
  }

  test("overwrite + compact preserve content; compact controls file count") {
    val path = tmpDir("sinks") + "/t"
    val df = (1 to 100).toDF("n").repartition(8)
    Sinks.overwrite(df, path)
    assert(spark.read.parquet(path).count() === 100)
    Sinks.compact(spark, path, targetFiles = 1)
    val files = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(f => f.endsWith(".parquet"))
    assert(files.length === 1)
    assert(spark.read.parquet(path).as[Int].collect().toSet === (1 to 100).toSet)
  }

  test("compactPartitioned: appends fragment every partition dir, the " +
    "rewrite folds each to ONE file with layout + rows preserved, and a " +
    "planted sibling table survives (destructive-utility rule)") {
    val root = tmpDir("sinks-cp")
    val path = root + "/t"
    def slice(tag: Int) =
      (1 to 30).map(n => (n % 3, tag * 100 + n)).toDF("k", "v")
    // snapshot + two appends: every k=v dir collects 3 files
    slice(0).repartition(col("k")).write.partitionBy("k").parquet(path)
    Seq(1, 2).foreach(t => slice(t).write.mode("append")
      .partitionBy("k").parquet(path))
    def partDirs = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.matches(".*/k=\\d+")).sorted
    def filesIn(d: String) = Files.list(Paths.get(d)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(partDirs.length === 3)
    assert(partDirs.forall(filesIn(_) >= 3), "appends did not fragment")
    val before = spark.read.parquet(path)
      .as[(Int, Int)].collect().sorted.toSeq
    // planted survivor: a sibling table next to the compacted one
    val sibling = root + "/t2"
    slice(9).write.partitionBy("k").parquet(sibling)
    val siblingBefore = Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq

    Sinks.compactPartitioned(spark, path, "k")

    assert(partDirs.length === 3, "partition layout changed")
    partDirs.foreach(d => assert(filesIn(d) === 1, s"$d not compacted"))
    assert(spark.read.parquet(path)
      .as[(Int, Int)].collect().sorted.toSeq === before)
    assert(Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq === siblingBefore,
      "sibling table was touched")
    val leftovers = Files.list(Paths.get(root)).toArray.map(_.toString)
      .filter(_.contains("-staging"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.toSeq}")
  }

  test("compactPartitioned tombstone fold: exactly the tombstoned keys " +
    "are dropped, survivors + layout intact, emptied partition dir " +
    "removed, planted sibling survives") {
    val root = tmpDir("sinks-tomb")
    val path = root + "/t"
    // k=0..3; all of k=3's rows share key 30 → its dir must VANISH
    def slice(tag: Int) =
      ((1 to 30).map(n => (n % 3, n, tag * 100 + n)) :+ (3, 30, tag))
        .toDF("k", "id", "v")
    slice(0).repartition(col("k")).write.partitionBy("k").parquet(path)
    slice(1).write.mode("append").partitionBy("k").parquet(path)
    val tomb = Seq(7, 13, 30).toDF("id") // ids spread across k=1, k=0, k=3
    val expected = spark.read.parquet(path)
      .filter(!col("id").isin(7, 13, 30))
      .as[(Int, Int, Int)].collect().sorted.toSeq
    val sibling = root + "/t2"
    slice(9).write.partitionBy("k").parquet(sibling)
    val siblingBefore = Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq

    Sinks.compactPartitioned(spark, path, Seq("k"), Some(tomb), Seq("id"))

    def partDirs = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.matches(".*/k=\\d+")).sorted
    def filesIn(d: String) = Files.list(Paths.get(d)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    assert(partDirs.length === 3, "k=3 (all rows tombstoned) should be gone")
    partDirs.foreach(d => assert(filesIn(d) === 1, s"$d not compacted"))
    assert(spark.read.parquet(path)
      .as[(Int, Int, Int)].collect().sorted.toSeq === expected,
      "fold dropped the wrong rows")
    assert(Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq === siblingBefore,
      "sibling table was touched")
  }

  test("rewritePartitioned: commits caller-provided content under a NEW " +
    "partition keyspace atomically — the directory layout is replaced " +
    "wholesale, a planted sibling survives, no staging leftovers; the " +
    "mid-swap crash states match the documented rename-aside contract") {
    val root = tmpDir("sinks-rw")
    val path = root + "/t"
    // old geometry: k ∈ {0,1,2}; new geometry: k ∈ {0..5} — the
    // keyspace itself changes (the re-bucket shape), which is why the
    // commit must be the atomic swap, not a per-partition mutation
    def oldT = (1 to 30).map(n => (n % 3, n)).toDF("k", "v")
    def newT = (1 to 30).map(n => (n % 6, 1000 + n)).toDF("k", "v")
    val newRows = (1 to 30).map(n => (n % 6, 1000 + n)).sorted
    oldT.repartition(col("k")).write.partitionBy("k").parquet(path)
    val sibling = root + "/t2"
    oldT.write.partitionBy("k").parquet(sibling)
    val siblingBefore = Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq
    def partKeys = Files.list(Paths.get(path)).toArray.map(_.toString)
      .filter(_.matches(".*/k=\\d+")).map(_.split("k=").last.toInt)
      .sorted.toSeq
    assert(partKeys === Seq(0, 1, 2))

    Sinks.rewritePartitioned(spark, path, newT, Seq("k"))

    assert(partKeys === Seq(0, 1, 2, 3, 4, 5),
      "new keyspace did not replace the old directory layout")
    assert(spark.read.parquet(path).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq === newRows)
    assert(Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq === siblingBefore,
      "sibling table was touched")
    def stagingDirs = Files.list(Paths.get(root)).toArray.map(_.toString)
      .filter(_.contains("-staging")).toSeq
    assert(stagingDirs.isEmpty, s"staging leftovers: $stagingDirs")

    // an EMPTY rewrite is refused before any rename (swapping a
    // schema-less dir in would brick the store — the compaction
    // guard's rationale, on the third swap client). The guard runs on
    // the STAGED content (round-16 advice: guarding the input frame
    // left a check-to-write race) and cleans its empty staged dir up,
    // so the refusal leaves neither the table changed nor leftovers.
    intercept[IllegalArgumentException] {
      Sinks.rewritePartitioned(spark, path, newT.limit(0), Seq("k"))
    }
    assert(spark.read.parquet(path).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq === newRows,
      "refused empty rewrite must leave the table untouched")
    assert(stagingDirs.isEmpty,
      s"refused empty rewrite left staging dirs: $stagingDirs")

    // crash BEFORE rename #0: the serving table is untouched (still the
    // post-rewrite content) and the staged copy sits aside, complete
    Sinks.crashBeforeRename = 0
    try intercept[IllegalStateException] {
      Sinks.rewritePartitioned(spark, path, oldT, Seq("k"))
    } finally Sinks.crashBeforeRename = -1
    assert(spark.read.parquet(path).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq === newRows,
      "crash before rename #0 must leave the serving table untouched")
    val stagedAfter0 = stagingDirs.filterNot(_.contains("-staging-old-"))
    assert(stagedAfter0.nonEmpty, "staged copy missing after crash #0")
    assert(spark.read.parquet(stagedAfter0.head).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq
      === (1 to 30).map(n => (n % 3, n)).sorted,
      "staged copy incomplete after crash #0")

    // crash BEFORE rename #1 (mid-swap): the table is at the side path
    // — nothing is lost, recoverable by hand exactly as documented
    Sinks.crashBeforeRename = 1
    try intercept[IllegalStateException] {
      Sinks.rewritePartitioned(spark, path, oldT, Seq("k"))
    } finally Sinks.crashBeforeRename = -1
    assert(!Files.exists(Paths.get(path)),
      "mid-swap the serving path should be vacated")
    val sides = stagingDirs.filter(_.contains("-staging-old-"))
    assert(sides.size === 1, s"expected one side copy, got $sides")
    assert(spark.read.parquet(sides.head).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq === newRows,
      "side copy lost the pre-swap table")
    // hand recovery: move the side copy back — the store serves again
    Files.move(Paths.get(sides.head), Paths.get(path))
    assert(spark.read.parquet(path).select("k", "v")
      .as[(Int, Int)].collect().sorted.toSeq === newRows)
    assert(Files.walk(Paths.get(sibling)).toArray
      .map(_.toString).sorted.toSeq === siblingBefore,
      "sibling table was touched by the crash paths")
  }
}

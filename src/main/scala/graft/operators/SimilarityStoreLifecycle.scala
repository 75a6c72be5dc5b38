package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.t
import graft.functions.Portable

/** The versioned-store machinery every lifecycle gate rides
  * (round-19 split, see [[SimilarityBase]]): store roots, the
  * publish/vacuum version allocator [[buildStoreVersion]], the ONE
  * store write discipline [[writeStore]], the s15 fold slices, index
  * compaction s21 and tombstone deletes s24. */
private[operators] trait SimilarityStoreLifecycle { this: Similarity.type =>

  /** Root dir of a gated lifecycle store — pid-keyed (the i1 store
    * pattern; TmpHygiene reclaims dead-pid copies), one root per `tag`
    * (s21 compaction, s24 delete fold, prof9 store profile, …) so the
    * lifecycle gates never collide on a path. Store VERSIONS live
    * under the root — see [[buildStoreVersion]]. */
  private[operators] def storeRoot(s: SparkSession, dir: String, tag: String): String =
    graft.core.StoreFs.base(s) +
      s"/graft-$tag-store-${graft.core.Tables.sourceFingerprint(s"$dir/documents.parquet")}" +
      s"-p${ProcessHandle.current.pid}"

  /** Monotone per-root version counters (JVM-wide: store content is a
    * pure function of the source dir, so versions are interchangeable
    * across sessions of one JVM). `alloc` hands out build targets;
    * `published` trails it and only advances when a build SUCCEEDS, so
    * [[idxStore]] never resolves to a half-built or failed version. */
  private[operators] val storeAlloc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  private[operators] val storePublished = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private[operators] def counter(m: java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong], root: String) =
    m.computeIfAbsent(root,
      _ => new java.util.concurrent.atomic.AtomicLong(0L))

  /** CURRENT version path of a gated lifecycle store — the one the
    * gate most recently finished building in this JVM (the serving
    * reads and the store-inspecting specs resolve through this). */
  private[operators] def idxStore(s: SparkSession, dir: String,
                                  tag: String): String = {
    val root = storeRoot(s, dir, tag)
    s"$root/v${counter(storePublished, root).get()}/idx"
  }

  private[operators] def s21Store(s: SparkSession, dir: String): String =
    idxStore(s, dir, "s21")

  /** Build a FRESH VERSION of a gated lifecycle store and return
    * (path, build result) — SNAPSHOT ISOLATION for the lifecycle
    * gates (round-15 advice: a wipe-in-place protocol let a later
    * invocation delete the store a prior caller's LAZY serving frame
    * was still scanning). Each invocation writes `$root/v<n>/idx` for
    * a fresh monotone n, so a returned frame reads its own immutable
    * version UNTIL VACUUM RETIRES IT; retention keeps {current,
    * previous published} — the Delta/Iceberg vacuum-retention
    * contract: a reader is safe while at most one newer rebuild has
    * completed (a frame held across TWO completed rebuilds is outside
    * the retention window and fails like any vacuumed Delta reader),
    * and the on-disk footprint is bounded at two versions per store.
    * Builds of the SAME root serialize on the per-store monitor
    * (concurrent identical rebuilds would only burn CPU — content is
    * a pure function of the source dir). */
  private[operators] def buildStoreVersion[T](s: SparkSession, dir: String,
                                   tag: String)
                                  (build: String => T): (String, T) = {
    val root = storeRoot(s, dir, tag)
    withStoreLifecycle(root) {
      val v = counter(storeAlloc, root).incrementAndGet()
      val store = s"$root/v$v/idx"
      // pre-wipe the allocated dir: pid recycling across JVM restarts
      // can revisit a killed run's version numbers (the replay-sink
      // rationale), and writeStore's base write is ErrorIfExists
      graft.core.StoreFs.deleteQuietly(s, s"$root/v$v")
      val out = build(store)
      val prevPub = counter(storePublished, root)
        .getAndAccumulate(v, math.max(_, _))
      // vacuum: keep {v, previous PUBLISHED} — retention must be keyed
      // on published versions, not allocation numbers, or a failed
      // build in between would shift the window onto the version a
      // live reader still holds; everything else (older published,
      // failed partials) is retired
      graft.core.StoreFs.listNames(s, root)
        .filter { name =>
          name.startsWith("v") &&
            name.drop(1).toLongOption
              .exists(n => n != v && n != prevPub)
        }
        .foreach(n => graft.core.StoreFs.deleteQuietly(s, s"$root/$n"))
      (store, out)
    }
  }

  /** THE store write discipline (one definition for every lifecycle
    * gate): repartition on the partition columns routes each value's
    * rows to a single task, so every write lands exactly one file per
    * touched partition dir — the fold cadence prof9 counts and s21
    * compacts. The in-partition (doc_id, chunk_idx) sort makes each
    * file's ROW ORDER content-deterministic (shuffle fetch order is
    * not), so for a fixed Spark/parquet/codec version the written
    * BYTES reproduce run-to-run — the property prof9's size readout
    * gates on (and a generally good one: stable encodings, stable
    * min/max stats). `append` = the fold writes; false = the base
    * snapshot. `dynamicOverwrite` = the STREAMING fold writes (d17's
    * tick): overwrite ONLY the partitions this frame touches — with a
    * batch partition column that is exactly the write's own batch=<id>
    * dirs, so an at-least-once foreachBatch retry REWRITES its own
    * partitions instead of appending duplicates (the idempotent
    * batch-subdir rule, expressed through the store writer). */
  private[operators] def writeStore(df: DataFrame, store: String,
                         partCols: Seq[String],
                         append: Boolean = false,
                         dynamicOverwrite: Boolean = false,
                         rowKeyCols: Seq[String] = Seq("doc_id", "chunk_idx"))
      : Unit = {
    require(!(append && dynamicOverwrite),
      "append and dynamicOverwrite are different fold disciplines")
    // rowKeyCols parameterized (round-17 review): non-chunk stores
    // (ZOrder's event layout) ride the same discipline with their own
    // in-partition row key instead of forking the writer
    val sortCols = (partCols ++ rowKeyCols).map(col)
    val w = df.repartition(partCols.map(col): _*)
      .sortWithinPartitions(sortCols: _*).write
      // pin the writer knobs the prof9 byte goldens depend on (round-16
      // advice): codec and row-group size are otherwise AMBIENT defaults
      // (spark.sql.parquet.compression.codec / parquet.block.size), so a
      // config drift would move every store's bytes at once — pinned
      // here, the golden's environment surface is the code plus the
      // Spark/parquet library version (the documented re-harvest axis).
      // Values = today's defaults, so committed goldens stay valid.
      .option("compression", "snappy")
      .option("parquet.block.size", (128L * 1024 * 1024).toString)
    val modal =
      if (dynamicOverwrite)
        w.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
      else if (append) w.mode(org.apache.spark.sql.SaveMode.Append)
      else w
    // phase label (guide §1.5): store writes dominate the lifecycle
    // gates' job lists — name them by store leaf + mode so JobProfile /
    // the UI attribute the cost
    val leaf = store.split('/').takeRight(3).mkString("/")
    val mode = if (dynamicOverwrite) "fold" else if (append) "append"
      else "base"
    graft.core.Jobs.labeled(df.sparkSession, s"writeStore[$mode] $leaf") {
      modal.partitionBy(partCols: _*).parquet(store)
    }
  }

  /** The arriving batch of the s15 fold, split into `parts` sub-batches
    * (modular cut on doc_id — deterministic, roughly even): the append
    * cadence that fragments the on-disk index s21 compacts. Slices of
    * the LAZY [[encodedBatch]] — the slice filter pushes down to the
    * scan, so the three appends sum to one batch encode of work (the
    * measured trade-off documented there). */
  private[operators] def s15BatchSlices(s: SparkSession, dir: String,
                                        parts: Long): Seq[DataFrame] = {
    val batch = encodedBatch(s, dir)
    (0L until parts).map(r =>
      batch.filter(pmod(col("doc_id"), lit(parts)) === lit(r)))
  }

  /** S21: RETRIEVAL-INDEX COMPACTION — the maintenance leg the s15 fold
    * cadence creates: each accepted batch APPENDS one-plus small files
    * to every touched `bkt=v` directory of the on-disk bucket-
    * partitioned index, so after N folds a probed bucket reads N files
    * (at 100 TB: a file-listing + task-launch storm on every query
    * batch). The gated query replays the whole lifecycle — snapshot
    * write of the base index partitioned by bucket, three batch
    * appends (the fragmentation), [[graft.sources.Sinks
    * .compactPartitioned]] (one file per bucket, directory layout
    * preserved, rename-aside swap), then serves the s15 query window
    * FROM THE COMPACTED STORE. Oracle = [[s15Sql]] verbatim: compaction
    * must be invisible to serving (row-identical to the refreshed
    * in-memory index ≡ full rebuild), which the spec pins alongside the
    * one-file-per-bucket layout. Cadence contract: BASELINE.md pairs
    * this with s15's fold (compact when files-per-bucket crosses the
    * read-amplification budget; the swap is partition-pruned-reader
    * safe because the layout never changes). Partition-column type
    * note: `bkt` round-trips through the directory name as an int —
    * cast back to long before the serving join so both gates join in
    * one keyspace. */
  val s21IndexCompaction: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s21") { store =>
      writeStore(baseRetrievalIndex(s, dir), store, Seq("bkt"))
      // one file per touched bucket per fold (the writeStore
      // discipline) — fragmentation is still linear in folds (base +
      // 3 appends = up to 4 files/bucket), which the compaction erases
      s15BatchSlices(s, dir, parts = 3L).foreach(
        writeStore(_, store, Seq("bkt"), append = true))
      graft.sources.Sinks.compactPartitioned(s, store, "bkt")
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
    retrieveTopK(s15QueryFrame(s, dir), idx, planes, s10K)
  }

  /** Tombstone doc rule of the s24 delete gate: doc_id ≡ [[s24DelRes]]
    * (mod [[s24DelMod]]) — a modular cut (the d11 slice rationale)
    * that hits BOTH the base snapshot and the appended batch, so the
    * fold is exercised against rows in old and new files alike
    * (~1/9 of docs retro-dropped, the curation-revocation story). */
  private[operators] val s24DelMod = 9L
  private[operators] val s24DelRes = 4L

  /** The DELETE SET as it arrives in production — doc ids a curation
    * gate retro-dropped, metadata-scale by contract (broadcast). */
  private[operators] def s24Tombstones(s: SparkSession,
                                       dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(s24DelMod)) === lit(s24DelRes))

  /** Delete-aware serving while tombstones are PENDING (serve-through):
    * broadcast anti-join on the delete key upstream of the probe join —
    * a map-side filter on the index scan, no new shuffle, no store
    * rewrite. This is what every query batch runs between a delete
    * landing and the next compaction folding it; SimilaritySpec pins
    * serve-through ≡ serve-over-the-folded-store row-for-row. */
  private[graft] def serveThroughTombstones(q: DataFrame, idx: DataFrame,
                                            tomb: DataFrame,
                                            keyCols: Seq[String]): DataFrame =
    retrieveTopK(q,
      graft.sources.Sinks.antiJoinTombstones(idx, tomb, keyCols),
      planes, s10K)

  /** S24: INDEX DELETE / TOMBSTONE FOLD (round-13 verdict item 2) —
    * the delete leg that completes the store lifecycle s15/s21 opened:
    * append-only index stores can't rewrite a file per revoked doc, so
    * deletes land as TOMBSTONES (a metadata-scale doc-id set) and are
    * FOLDED — physically removed — at the compaction cadence the store
    * already pays for ([[graft.sources.Sinks.compactPartitioned]]'s
    * tombstone parameter). The gated query replays the lifecycle:
    * snapshot write of the base index (partitioned by bucket), one
    * batch append (the s15 fold), the [[s24Tombstones]] delete set
    * folded at compaction, then serves the s15 query window from the
    * folded store. Oracle = the s15 serving SQL with the delete rule
    * excluded in the index CTE (the s22 one-variable pattern: the
    * predicate is the ONLY diff), so the gate verifies
    * fold ≡ rebuild-minus-deleted end-to-end; the serve-THROUGH twin
    * ([[serveThroughTombstones]], what queries run before the fold) is
    * spec-pinned equal. Scale shape: the anti-join broadcasts the
    * delete set (map-side against the store scan inside the rewrite);
    * compaction cost is the store rewrite already budgeted by the s21
    * cadence — the delete itself adds no pass. */
  val s24IndexDelete: Q = (s, dir) => {
    val store = buildStoreVersion(s, dir, "s24") { store =>
      writeStore(baseRetrievalIndex(s, dir), store, Seq("bkt"))
      writeStore(encodedBatch(s, dir), store, Seq("bkt"), append = true)
      graft.sources.Sinks.compactPartitioned(s, store, Seq("bkt"),
        Some(s24Tombstones(s, dir)), Seq("doc_id"))
    }._1
    val idx = s.read.parquet(store)
      .withColumn("bkt", col("bkt").cast("long"))
    retrieveTopK(s15QueryFrame(s, dir), idx, planes, s10K)
  }

}

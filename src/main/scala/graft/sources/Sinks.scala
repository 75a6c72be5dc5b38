package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Parquet sinks replicating the reference's Delta write surface
  * (SURVEY.md §2.1 S5-S8) without Delta jars.
  *
  * Scale posture: file-count control is a parameter, not a hardcoded
  * `coalesce(1)` — the reference's single-file layout is an MB-scale
  * choice; at 100 TB the default (0 = natural partitioning) keeps write
  * parallelism, and compaction is an explicit maintenance call.
  */
object Sinks {

  /** S5: full overwrite (schema replaced by construction on Parquet).
    * targetFiles = 0 → keep natural partitioning (scale default);
    * n > 0 → coalesce(n) (reference used 1). */
  def overwrite(df: DataFrame, path: String, targetFiles: Int = 0): Unit = {
    val out = if (targetFiles > 0) df.coalesce(targetFiles) else df
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** S7: compaction — rewrite a table at a target file count. */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 1): Unit = {
    val df = spark.read.parquet(path)
    // Materialize before overwriting the path being read.
    val staged = stagePath(path)
    df.coalesce(math.max(targetFiles, 1)).write.parquet(staged)
    swap(spark, staged, path)
  }

  /** S6: Delta `replaceWhere` emulation on plain Parquet — replace only
    * the `sliceCol = sliceValue` rows of a table partitioned by partCol
    * (reference scripts/spark_ops.py:169-175 writes the feature store
    * with replaceWhere dtRef='<date>' partitionBy dtYear).
    *
    * Algorithm (idempotent; atomic per partition-directory swap):
    *  1. first write → plain partitioned write;
    *  2. else: affected partitions = distinct partCol values in the new
    *     slice UNION partitions already holding rows of the slice values
    *     (metadata-scale collect — one value per year here). The second
    *     leg makes re-runs correct even when a corrected slice maps rows
    *     to a DIFFERENT partCol value than the prior run: the stale rows
    *     in the old partition are found and dropped, not orphaned. It
    *     costs a column-pruned scan of sliceCol only (partCol is a
    *     partition column — free), with parquet min/max skipping;
    *  3. read ONLY those partitions (partition-pruned scan), drop rows of
    *     the incoming slice value, union the new slice;
    *  4. write the merged partitions to a staging dir, then swap each
    *     affected `partCol=v` directory via rename (close to atomic per
    *     partition; readers of other partitions are never touched).
    *
    * Re-running the same slice yields byte-identical content (the old
    * slice is dropped before the union every time).
    */
  def replaceSlice(spark: SparkSession, newSlice: DataFrame, path: String,
                   sliceCol: String, sliceValue: String,
                   partCol: String): Unit =
    replaceSlices(spark, newSlice, path, sliceCol, Seq(sliceValue), partCol)

  /** Batched form of [[replaceSlice]]: drop ALL incoming slice values from
    * the affected partitions, union the new slices, swap once — the
    * backfill batching lever (etl.Ingestor.execBatched). */
  def replaceSlices(spark: SparkSession, newSlices: DataFrame, path: String,
                    sliceCol: String, sliceValues: Seq[String],
                    partCol: String): Unit = {
    // Cluster rows by partCol before writing: slice frames typically
    // arrive on shuffle-partition layout (32 writer tasks × P dirs =
    // hundreds of tiny files per backfill step). One narrow shuffle of
    // slice-sized data → ~1 file per partition dir and far fewer write
    // tasks. Backfill slices are small by contract (one date's features);
    // for jumbo slices repartition(N, partCol, …) would be the lever.
    def clustered(df: DataFrame) = df.repartition(col(partCol))
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) {
      clustered(newSlices).write.partitionBy(partCol).parquet(path)
      return
    }
    val incoming = newSlices.select(partCol).distinct().collect()
      .map(_.get(0).toString)
    require(incoming.nonEmpty, s"empty slice for $sliceCol in $sliceValues")
    val stale = spark.read.parquet(path)
      .filter(col(sliceCol).isin(sliceValues: _*))
      .select(partCol).distinct().collect().map(_.get(0).toString)
    val affected = (incoming ++ stale).distinct
    val existing = spark.read.parquet(path)
      .filter(col(partCol).isin(affected.toSeq: _*))
      .filter(!col(sliceCol).isin(sliceValues: _*) || col(sliceCol).isNull)
    val merged = existing.unionByName(newSlices)
    val staged = stagePath(path)
    clustered(merged).write.partitionBy(partCol).parquet(staged)
    affected.foreach { v =>
      val dst = new Path(root, s"$partCol=$v")
      val src = new Path(staged, s"$partCol=$v")
      if (fs.exists(dst)) fs.delete(dst, true)
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new Path(staged), true)
  }

  /** Keyed MERGE (upsert) emulation on plain Parquet — the Delta
    * `MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` surface for a
    * CDC-style updates batch: incoming rows REPLACE existing rows with
    * the same key, new keys are inserted, and the batch itself is
    * de-duplicated first (keep the row with the highest `seqCol` per
    * key — the CDC de-batching rule; `seqCol` is transport metadata and
    * is dropped from what lands in the table).
    *
    * Partition-pruned like [[replaceSlices]]: affected partitions =
    * partitions the de-batched updates land in UNION partitions
    * currently holding any updated key (found with a key-only semi
    * join — the second leg keeps re-runs correct when an update moves a
    * row ACROSS partitions: the stale copy is dropped, not orphaned).
    * Only those `partCol=v` directories are rewritten and swapped;
    * at 100 TB an upsert batch touching k partitions costs a scan+write
    * of k partitions, never the table. Idempotent: re-running the same
    * batch anti-joins the same keys out before the union, yielding
    * byte-identical content. */
  def upsert(spark: SparkSession, updates: DataFrame, path: String,
             keyCols: Seq[String], seqCol: String, partCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, desc, row_number}
    def clustered(df: DataFrame) = df.repartition(col(partCol))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc(seqCol))
    val latest = updates.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", seqCol)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) {
      clustered(latest).write.partitionBy(partCol).parquet(path)
      return
    }
    val incoming = latest.select(partCol).distinct().collect()
      .map(_.get(0).toString)
    val keys = latest.select(keyCols.map(col): _*)
    val stale = spark.read.parquet(path)
      .join(keys, keyCols, "left_semi")
      .select(partCol).distinct().collect().map(_.get(0).toString)
    val affected = (incoming ++ stale).distinct
    val kept = spark.read.parquet(path)
      .filter(col(partCol).isin(affected.toSeq: _*))
      .join(keys, keyCols, "left_anti")
    val merged = kept.unionByName(latest)
    val staged = stagePath(path)
    clustered(merged).write.partitionBy(partCol).parquet(staged)
    affected.foreach { v =>
      val dst = new Path(root, s"$partCol=$v")
      val src = new Path(staged, s"$partCol=$v")
      if (fs.exists(dst)) fs.delete(dst, true)
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(new Path(staged), true)
  }

  /** Bucketed managed table — the co-located-join layout (SURVEY §7.4
    * scale rules): two tables bucketed by the same key into the same
    * bucket count join WITHOUT a shuffle on either side (Exchange-free
    * SortMergeJoin). At 100 TB this converts every recurring fact-fact
    * join on the bucket key from 2 shuffles to 0; the write cost is paid
    * once. Managed-table API because bucket metadata lives in the
    * catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** S8: VACUUM analog — plain-Parquet overwrites already replace files,
    * so the only orphans are staging dirs from interrupted
    * replaceSlice/compact runs; delete those older than `minAgeMs`
    * (default 1h — NEVER 0 in production: a younger staging dir may
    * belong to an in-flight writer, and deleting it mid-run loses the
    * partition being swapped). Returns the count removed. */
  def vacuum(spark: SparkSession, path: String,
             minAgeMs: Long = 3600 * 1000L): Int = {
    val p = new Path(path)
    val parent = p.getParent
    if (parent == null) return 0
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(parent)) return 0
    val cutoff = System.currentTimeMillis() - minAgeMs
    val orphans = fs.listStatus(parent).filter { st =>
      st.getPath.getName.startsWith(s"${p.getName}-staging-") &&
        st.getModificationTime < cutoff
    }
    orphans.foreach(st => fs.delete(st.getPath, true))
    orphans.length
  }

  private def stagePath(path: String): String =
    s"$path-staging-${UUID.randomUUID().toString.take(8)}"

  /** Swap a staged rewrite into place (used by compact). */
  private def swap(spark: SparkSession, staged: String, path: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(staged), new Path(path))
  }
}

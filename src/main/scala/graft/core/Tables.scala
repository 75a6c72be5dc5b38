package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Testdata star-schema access (TESTDATA.md). One parquet file per table
  * under the scale-factor dir passed to every query: `{dir}/{name}.parquet`.
  *
  * View-registration mirrors the reference's catalog convention: view name =
  * last path segment (reference scripts/spark_ops.py:49-64).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Content fingerprint of a source table's files (names + sizes +
    * mtimes): temp/staging dirs keyed on it auto-invalidate when the
    * driver regenerates testdata in place — a staging copy keyed on the
    * path alone would silently serve STALE data against a fresh oracle.
    * 64-bit md5 prefix, not String.hashCode: a 32-bit collision would
    * silently reuse a stale staging dir, the exact failure the
    * fingerprint exists to prevent. */
  def sourceFingerprint(path: String): String = {
    val f = new java.io.File(path)
    val parts = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq(f))
    val sig = parts.map(p => s"${p.getName}:${p.length}:${p.lastModified}")
      .sorted.mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest((path + "|" + sig).getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
  }

  /** Register every star-schema table as a temp view named after the table.
    * Idempotent; used by SQL-text queries (ordinal group-by etc.). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))

  /** Reference-style view registration: name = last path segment
    * (reference scripts/spark_ops.py:62-64). */
  def registerViewFromPath(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val name = new org.apache.hadoop.fs.Path(path).getName
      .stripSuffix(".parquet")
    df.createOrReplaceTempView(name)
    df
  }
}

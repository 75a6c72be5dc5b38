package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture (small core count for test speed). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Local filesystem view of a StoreFs-derived path: the lifecycle
    * base is `file:`-qualified (StoreFs.base — the unset-key default
    * must stay local regardless of fs.defaultFS), but specs that
    * inspect store layouts do so with java.io.File, which wants the
    * bare path. */
  def localPath(p: String): String = p.stripPrefix("file:")
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.core.Sessions.builder(master = "local[4]",
      shufflePartitions = "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

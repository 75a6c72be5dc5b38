package graft.core

import org.apache.spark.sql.SparkSession

/** Job labeling (optimization-guide §1.5): the lifecycle operators run
  * dozens of Spark jobs per gated invocation (base snapshot writes,
  * per-micro-batch folds, compaction rewrites, serving reads), and an
  * unlabeled job list cannot say which action carries the cost. Wrap
  * each phase in [[labeled]] so the UI / tools.JobProfile attribute
  * wall time to named phases. setJobDescription is THREAD-LOCAL, so
  * labels set inside a foreachBatch body correctly tag that batch's
  * jobs without leaking to concurrent streams; the previous value is
  * restored on exit so callers' own labels survive nesting. */
object Jobs {

  def labeled[T](s: SparkSession, desc: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }

  /** Daemon pool for [[concurrently]] — cached (these are short,
    * bursty driver-side submissions: two store writes per tick), never
    * holds the JVM open. */
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-concurrent-job")
      t.setDaemon(true)
      t
    })

  /** Run two INDEPENDENT Spark actions concurrently and return both
    * results (optimization-guide §2.6: actions are only sequential
    * because driver code calls them sequentially; submitting the second
    * while the first drains lets its tasks back-fill executors freed by
    * the first's straggler tail). Callers own the independence claim —
    * the two bodies must not write the same directory (Hadoop's
    * FileOutputCommitter stages under a shared `_temporary/<jobId>`
    * path, so same-dir concurrent writes can collide) and must not
    * depend on each other's side effects. `fb` runs on the calling
    * thread (its thread-local job description/group is preserved); `fa`
    * runs on the pool. Exceptions from either side propagate — `fa`'s
    * unwrapped from the ExecutionException so callers see the real
    * failure class. */
  def concurrently[A, B](fa: => A)(fb: => B): (A, B) = {
    val f = pool.submit(new java.util.concurrent.Callable[A] {
      override def call(): A = fa
    })
    val b = fb
    val a = try f.get()
    catch { case e: java.util.concurrent.ExecutionException =>
      throw e.getCause
    }
    (a, b)
  }
}

package graft.tools

/** Dev tool: run one named SparkEntry query N times with timing, then print
  * its formatted physical plan. Usage:
  *   runMain graft.tools.QDebug <name> [sfDir] [reps]
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.get()
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[qdebug] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

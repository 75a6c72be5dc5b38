package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev tool: attribute a query's wall time to its Spark JOBS — the
  * measurement step (guide §1) behind picking optimization targets in
  * the multi-action lifecycle queries (tick replays, store rewrites),
  * where one registry entry runs dozens of jobs and the per-query bench
  * number cannot say WHICH action carries the cost. Runs each named
  * query `reps` times (first rep warms codegen/JIT/persisted silver
  * stages), profiles the LAST rep with a job listener, and prints every
  * job's duration + callsite, sorted descending.
  *
  * Usage: runMain graft.tools.JobProfile <name>[,name...] [sfDir] [reps]
  */
object JobProfile {

  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.core.Sessions.get()
    graft.core.SchemaCheck.warn(spark, sfDir)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    @volatile var collecting = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) {
          val p = Option(e.properties)
          val site = p.flatMap(x =>
              Option(x.getProperty("spark.job.description")))
            .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
            .getOrElse("?")
          starts.put(e.jobId, (System.nanoTime(), site))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = starts.remove(e.jobId)
        if (st != null)
          done.add((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 until reps).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"[jobprofile] $name warm rep $i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      done.clear(); starts.clear()
      collecting = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      collecting = false
      Thread.sleep(300) // let trailing JobEnd events drain
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq
      println(f"\n== $name wall ${wall}%.2fs, ${jobs.size} jobs, " +
        f"job-sum ${jobs.map(_._2).sum}%.2fs ==")
      jobs.sortBy(-_._2).take(40).foreach { case (id, sec, site) =>
        println(f"  [jobprofile] job=$id%-4d ${sec}%6.3fs  $site")
      }
      // jobs can overlap or leave gaps (driver-side work); group by site
      println(s"-- by callsite --")
      jobs.groupBy(_._3).toSeq.map { case (site, js) =>
        (js.map(_._2).sum, js.size, site)
      }.sortBy(-_._1).foreach { case (sum, n, site) =>
        println(f"  [jobprofile] ${sum}%6.3fs n=$n%-3d $site")
      }
    }
    spark.stop()
  }
}

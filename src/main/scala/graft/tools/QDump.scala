package graft.tools

/** Dev tool: print one named SparkEntry query's full result as TSV —
  * the golden-harvest companion to QDebug (used to pin golden-VALUES
  * oracle rows from fresh-JVM runs: m5/m7/c4/u14/s23, and m2/m3 since
  * round 19). Usage:
  *   runMain graft.tools.QDump <name> [sfDir]
  */
object QDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.Sessions.get()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns
    println(s"[qdump] $name $sfDir cols=${cols.mkString(",")}")
    df.collect().foreach { r =>
      println("[qdump] " + cols.indices.map(i =>
        Option(r.get(i)).map(_.toString).getOrElse("NULL")).mkString("\t"))
    }
    spark.stop()
  }
}

package graft

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}} for the driver's
  * BENCH_r{N}.json. Timing forces FULL materialization of the query's own
  * physical plan via queryExecution.toRdd.count() — a plain df.count()
  * would let Catalyst prune every projected column (map-only queries like
  * the minhash signatures would measure as a parquet row-count, i.e. ~0). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.get()
    def run(name: String): Long =
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    // Warm the JVM once so numbers are steady-state: q1 (codegen agg),
    // t1 (regex), d2 (interpreted higher-order + md5 paths), a6 (exact
    // percentile / ObjectHashAggregate) — the first query on each path in
    // a fresh JVM otherwise pays seconds of C2 compilation.
    try { run("q1_agg"); run("t1_tokens"); run("d2_minhash_sig"); run("a6_median") }
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

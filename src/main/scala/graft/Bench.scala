package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced end-to-end with a noop
  * write (full plan execution, no driver collect, no agg-pushdown
  * shortcuts a bare count() would take).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM + parquet footers once (session init dominates
    // otherwise and measures the JIT, not the plans).
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // two passes per query, report min(cold, warm): pass 1 pays one-time
    // codegen compilation + AQE statistics; pass 2 is the steady-state
    // throughput a long-running cluster job sees. A query that throws
    // reports -1, not a meaningless elapsed time.
    val results = SparkEntry.headlines.map { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable => System.err.println(s"[bench] ${q.name}: $e"); -1.0
        }
      }
      val cold = once()
      val warm = once()
      val best = if (cold < 0 || warm < 0) -1.0 else math.min(cold, warm)
      q.name -> best
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

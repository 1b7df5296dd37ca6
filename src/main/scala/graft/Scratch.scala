package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness (dev-only, kept in-tree so perf work is
  * reproducible): times named queries N times each in one JVM to beat
  * inter-invocation variance. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // extra runtime confs for diagnostics sessions, e.g.
    // SPARK_GRAFT_CONFS=spark.graft.contain.debug=true,spark.graft.suffix.debug=true
    sys.env.get("SPARK_GRAFT_CONFS").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    // tolerate partial dirs (ScaleBench corpora carry only
    // documents/embeddings) — warm what exists, name what's skipped;
    // NonFatal so OOM/interrupt still surface (r14 ADVICE)
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).schema
      catch { case scala.util.control.NonFatal(e) =>
        println(s"SCRATCH skip table $n: ${e.getClass.getSimpleName}") }
    }
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) =>
      println(s"SCRATCH skip entry warm-up: ${e.getClass.getSimpleName}") }
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SCRATCH $n min=${ts.min}%.3f med=${ts.sorted.apply(reps / 2)}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}

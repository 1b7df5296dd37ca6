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
    // otherwise and measures the JIT, not the plans). Guarded per table:
    // round 8's bench was zeroed ENTIRELY because one table's loader threw
    // here, before any per-query try/catch — a broken table must cost its
    // own queries -1, never the round's numbers.
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).schema
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n: $e") }
    }
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => System.err.println(s"[bench] warmup entry: $e") }

    // two passes per query, report min(cold, warm): pass 1 pays one-time
    // codegen compilation + AQE statistics; pass 2 is the steady-state
    // throughput a long-running cluster job sees. A query that throws
    // reports -1, not a meaningless elapsed time.
    // Optional comma-separated headline filter for focused iteration
    // (SPARK_GRAFT_BENCH_ONLY=q98_dup_spans,q100_ann_ivfpq); the
    // driver never sets it, so the round bench always runs everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // ANN index queries are timed as build + probe components below —
    // one number would hide the query-side cost the 100×-scale story
    // depends on (the build is staged once and amortized).
    val split = Set("q85_ann_pq", "q100_ann_ivfpq", "q117_ann_sq8")
    val picked = only.fold(SparkEntry.headlines)(names =>
      SparkEntry.headlines.filter(q => names(q.name)))
      .filterNot(q => split(q.name) && only.isEmpty)
    val results = picked.map { q =>
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

    // Build/probe split for the ANN index headliners: the build is
    // forced via localCheckpoint (the local stand-in for staging the
    // index partitionBy(cell) at scale), then probes run against the
    // materialized artifact. min(cold, warm) convention as above.
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime()
      try { f; (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable => System.err.println(s"[bench] split: $e"); -1.0 }
    }
    def two(f: () => Double): Double = {
      val c = f(); val w = f()
      if (c < 0 || w < 0) -1.0 else math.min(c, w)
    }
    val splitResults: Seq[(String, Double)] =
      if (only.nonEmpty) Seq.empty
      else {
        var pq: org.apache.spark.sql.DataFrame = null
        val b85 = two(() => timed {
          pq = operators.AnnOps.pqIndex(spark, sfDir).localCheckpoint()
        })
        val p85 = two(() => timed {
          operators.AnnOps.pqProbe(spark, sfDir, pq)
            .write.format("noop").mode("overwrite").save()
        })
        var ivfpq: org.apache.spark.sql.DataFrame = null
        val b100 = two(() => timed {
          ivfpq = operators.AnnOps.ivfpqIndex(spark, sfDir).localCheckpoint()
        })
        val p100 = two(() => timed {
          operators.AnnOps.ivfpqProbe(spark, sfDir, ivfpq)
            .write.format("noop").mode("overwrite").save()
        })
        var sq8: (org.apache.spark.sql.DataFrame, Seq[Double], Seq[Double]) = null
        val b117 = two(() => timed {
          val (c, mn, sc) = operators.AnnOps.sq8Index(spark, sfDir)
          sq8 = (c.localCheckpoint(), mn, sc)
        })
        val p117 = two(() => timed {
          operators.AnnOps.sq8Probe(spark, sfDir, sq8._1, sq8._2, sq8._3)
            .write.format("noop").mode("overwrite").save()
        })
        Seq("q85_ann_pq_build" -> b85, "q85_ann_pq_probe" -> p85,
          "q100_ann_ivfpq_build" -> b100, "q100_ann_ivfpq_probe" -> p100,
          "q117_ann_sq8_build" -> b117, "q117_ann_sq8_probe" -> p117)
      }

    val all = results ++ splitResults
    val qs = all.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = all.count(_._2 < 0)
    val total = all.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}

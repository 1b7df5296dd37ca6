package graft.pipeline

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

class InteractiveSpec extends SparkSpec {

  test("IDE path: single-doc evaluation launches ZERO Spark jobs") {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    // warm implicit machinery first so listener only sees the eval
    Interactive.evalSingle(spark, "warmup", Seq(PromptSpec("x", "first word", "text")),
      () => new MockLLM)
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = Interactive.evalSingle(spark,
        "batch run batch again with spark",
        Seq(
          PromptSpec("n_batch", "count of word 'batch'", "number"),
          PromptSpec("has_spark", "does it mention 'spark'", "boolean"),
          PromptSpec("first", "first word", "text")),
        () => new MockLLM)
      assert(got.map(r => r.name -> r.value).toMap ==
        Map("n_batch" -> 2.0, "has_spark" -> true, "first" -> "batch"))
      Thread.sleep(500) // listener delivery is async
      assert(jobs.get() == 0L, s"expected driver-only eval, saw ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

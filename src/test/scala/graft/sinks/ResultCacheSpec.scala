package graft.sinks

import graft.SparkSpec
import graft.streaming.MemoryQueue

/** K6: the API-polling result cache (result_cache_utils.py semantics) —
  * per-execution list keyed api_results:{workflow}:{execution}, streamed
  * in via foreachBatch, TTL-expired, deletable. */
class ResultCacheSpec extends SparkSpec {

  final class FakeClock(var now: Long = 1000L) extends (() => Long) with Serializable {
    def apply(): Long = now
  }

  private def ns() = s"rc-${java.util.UUID.randomUUID()}"

  test("update/get/delete round trip per (workflow, execution)") {
    val namespace = ns()
    val cache = new ResultCache(() => new MemoryQueue(namespace), ttlSeconds = 600)
    cache.update("wf1", "ex1", """{"file":"a.pdf","ok":true}""")
    cache.update("wf1", "ex1", """{"file":"b.pdf","ok":false}""")
    cache.update("wf1", "ex2", """{"file":"c.pdf","ok":true}""")
    assert(cache.get("wf1", "ex1").size === 2)
    assert(cache.get("wf1", "ex2").size === 1)
    assert(cache.get("wf9", "nope").isEmpty)
    cache.delete("wf1", "ex1")
    assert(cache.get("wf1", "ex1").isEmpty)
    assert(cache.get("wf1", "ex2").size === 1) // other executions untouched
  }

  test("streaming sink: N per-execution results land, poll returns them parsed") {
    import spark.implicits._
    val namespace = ns()
    val cache = new ResultCache(() => new MemoryQueue(namespace), ttlSeconds = 600)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-rc-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rc-ckpt").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "batch.json"),
      (1 to 6).map(i =>
        s"""{"workflow_id":"wf","execution_id":"ex${i % 2}","file":"f$i","total":$i}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("workflow_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("execution_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("total", org.apache.spark.sql.types.LongType)))
    val in = spark.readStream.schema(schema).json(srcDir)
    cache.sink(in, ckpt).awaitTermination()

    assert(cache.get("wf", "ex0").size === 3)
    assert(cache.get("wf", "ex1").size === 3)
    val parsed = cache.getDataFrame(spark, "wf", "ex1")
    assert(parsed.select("file").as[String].collect().toSet === Set("f1", "f3", "f5"))
    // the keyed columns are stripped from the cached payload
    assert(!parsed.columns.contains("workflow_id"))
  }

  test("TTL expiry empties the execution's list; poll-after-expiry is clean") {
    val namespace = ns()
    val clock = new FakeClock(5000)
    val cache = new ResultCache(() => new MemoryQueue(namespace, clock), ttlSeconds = 120)
    cache.update("wf", "ex", """{"file":"x"}""")
    clock.now = 5119
    assert(cache.get("wf", "ex").size === 1)
    clock.now = 5120
    assert(cache.get("wf", "ex").isEmpty)
  }
}

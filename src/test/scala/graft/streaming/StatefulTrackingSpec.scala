package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryListener

class StatefulTrackingSpec extends SparkSpec {

  test("T7: in-flight state — first PROCESS, duplicates SKIP, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StatefulTracking.FileEvent]
    // NoTimeout in tests: ProcessingTimeTimeout schedules continuous
    // micro-batches and processAllAvailable never quiesces
    val decisions = StatefulTracking.decide(spark, input.toDS(), timeoutMs = 0L)

    val ckpt = Files.createTempDirectory("graft-state-ckpt").toString
    val q = decisions.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("track_out")
      .start()

    input.addData(
      StatefulTracking.FileEvent("h1", "/a/x.pdf", 1000L),
      StatefulTracking.FileEvent("h1", "/b/x_copy.pdf", 2000L),  // same batch dup
      StatefulTracking.FileEvent("h2", "/a/y.pdf", 1500L))
    q.processAllAvailable()
    input.addData(
      StatefulTracking.FileEvent("h1", "/c/x_again.pdf", 9000L)) // cross-batch dup
    q.processAllAvailable()
    q.stop()

    val got = spark.table("track_out").as[StatefulTracking.TrackDecision]
      .collect().map(d => (d.file_hash, d.file_path, d.decision)).toSet
    assert(got == Set(
      ("h1", "/a/x.pdf", "PROCESS"),
      ("h1", "/b/x_copy.pdf", "SKIP_IN_FLIGHT"),
      ("h2", "/a/y.pdf", "PROCESS"),
      ("h1", "/c/x_again.pdf", "SKIP_IN_FLIGHT")))
  }

  test("T6: StreamingQueryListener observes progress (log streaming)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        seen.add(s"started:${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        seen.add(s"progress:${e.progress.numInputRows}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        seen.add("terminated")
    }
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Int]
      val ckpt = Files.createTempDirectory("graft-listen-ckpt").toString
      val q = input.toDS().writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("listen_out").start()
      input.addData(1, 2, 3)
      q.processAllAvailable()
      q.stop()
      // listener events are delivered async
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !seen.toArray.map(_.toString).exists(_ == "terminated")) Thread.sleep(100)
      val events = seen.toArray.map(_.toString)
      assert(events.exists(_.startsWith("started:listen_out")))
      assert(events.exists(_.startsWith("progress:3")))
      assert(events.contains("terminated"))
    } finally spark.streams.removeListener(listener)
  }
}

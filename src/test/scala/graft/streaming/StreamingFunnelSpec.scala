package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// file-level: encoder codegen needs a statically accessible case class
final case class FunnelEvent(user_id: Long, event_type: String,
    ts: java.sql.Timestamp, event_id: Long)

/** The streaming funnel equals the q135 batch operator when the real
  * events table is cut into in-order micro-batches — per user: step
  * count and all three completion timestamps. Also pins monotonicity:
  * a user's emitted step count never decreases across batches. */
class StreamingFunnelSpec extends SparkSpec {

  test("3 in-order micro-batches reproduce the q135 batch funnel exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[FunnelEvent].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val batches = events.grouped((events.length + 2) / 3).toSeq
    assert(batches.length === 3)

    val in = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.progress(in.toDF())
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    val q = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("funnel_out").start()
    batches.foreach { b => in.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
    q.stop()

    val emitted = spark.table("funnel_out").collect()
    // monotone snapshots: within a user, higher-step rows never precede
    // lower-step rows chronologically — take the max-step row as final
    val finals = emitted.groupBy(_.getLong(0)).map { case (u, rs) =>
      u -> rs.maxBy(r => (r.getLong(4),
        Option(r.get(3)).map(_.asInstanceOf[Long]).getOrElse(Long.MinValue),
        Option(r.get(2)).map(_.asInstanceOf[Long]).getOrElse(Long.MinValue),
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(Long.MinValue)))
    }

    val batch = graft.operators.EventsOps.q135Funnel.fn(spark, dir).collect()
    assert(batch.length === finals.size, "user sets must agree")
    def micros(r: Row, i: Int): Any =
      Option(r.getTimestamp(i)).map(t =>
        t.getTime * 1000L + (t.getNanos / 1000) % 1000).orNull
    batch.foreach { b =>
      val f = finals(b.getLong(0))
      assert(f.getLong(4) === b.getLong(4), s"user ${b.getLong(0)} steps")
      assert(f.get(1) === micros(b, 1), s"user ${b.getLong(0)} t_signup")
      assert(f.get(2) === micros(b, 2), s"user ${b.getLong(0)} t_view")
      assert(f.get(3) === micros(b, 3), s"user ${b.getLong(0)} t_purchase")
    }
    // per-user step monotonicity across ALL emissions (not just finals)
    emitted.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val maxSteps = rs.map(_.getLong(4)).max
      val finalSteps = finals(u).getLong(4)
      assert(finalSteps === maxSteps, s"user $u regressed in steps")
    }
  }

  test("late events: dropped beyond the bound, monotone within it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(t: Long, tpe: String, id: Long) =
      FunnelEvent(1L, tpe, new java.sql.Timestamp(t / 1000), id)
    val late = spark.sparkContext.longAccumulator("funnel_late")
    val in = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.progress(in.toDF(),
      maxLateness = Some(50000L), lateEvents = Some(late))
    val ckpt = Files.createTempDirectory("graft-funnel-late-ckpt").toString
    val q = out.writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("funnel_late").start()
    def drain(es: FunnelEvent*): Unit = { in.addData(es: _*); q.processAllAvailable() }
    // batch 1: view+purchase with no signup — funnel stays at 0 steps,
    // high-water mark advances to 200
    drain(ev(100000, "view", 1), ev(200000, "purchase", 2))
    // batch 2: a signup 160ms older than the high-water mark — beyond
    // the 50ms bound: dropped and counted, funnel unchanged
    drain(ev(40000, "signup", 3))
    // batch 3: a signup 40ms late — WITHIN the bound: admitted, starts
    // the funnel (empty earlier slot), but the already-seen view and
    // purchase are NOT retroactively re-derived
    drain(ev(160000, "signup", 4))
    // batch 4: a fresh view after the signup advances to step 2
    drain(ev(210000, "view", 5))
    q.stop()
    val rows = spark.table("funnel_late").collect()
      .map(r => (r.getLong(4), Option(r.get(1)), Option(r.get(2))))
    // per-batch snapshots: 0 steps, 0 steps (late drop), 1 step, 2 steps
    assert(rows.map(_._1).toSeq === Seq(0L, 0L, 1L, 2L), rows.mkString(","))
    assert(rows(2)._2 === Some(160000L), "in-bound late signup sets t1")
    assert(rows(2)._3 === None, "the pre-signup view must not be re-derived")
    assert(rows(3)._3 === Some(210000L))
    assert(late.value === 1L, "exactly the beyond-bound signup is dropped")
  }
}

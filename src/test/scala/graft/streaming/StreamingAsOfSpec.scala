package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// file-level: encoder codegen needs statically accessible case classes
final case class Trade(sym: String, t: Long, qty: Long)
final case class Quote(sym: String, qt: Long, px: Double)

class StreamingAsOfSpec extends SparkSpec {

  /** One feed step: quotes and/or trades. The harness DRAINS the query
    * after each side's add (quotes first), so arrival order is
    * deterministic — the continuously-triggering engine would otherwise
    * race the two MemoryStreams into arbitrary micro-batches. */
  private case class Step(quotes: Seq[Quote] = Nil, trades: Seq[Trade] = Nil)

  private def run(
      steps: Seq[Step],
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      name: String = "asof_out",
      maxLateness: Option[Long] = None,
      lateEvents: Option[org.apache.spark.util.LongAccumulator] = None): Seq[Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[Trade]
    val rIn = MemoryStream[Quote]
    val joined = StreamingAsOf.join(
      lIn.toDF(), rIn.toDF(), "sym", "t", "qt",
      strict = strict, tolerance = tolerance,
      maxLateness = maxLateness, lateEvents = lateEvents)
    val ckpt = Files.createTempDirectory("graft-asof-ckpt").toString
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
    steps.foreach { s =>
      if (s.quotes.nonEmpty) { rIn.addData(s.quotes: _*); q.processAllAvailable() }
      if (s.trades.nonEmpty) { lIn.addData(s.trades: _*); q.processAllAvailable() }
    }
    q.stop()
    spark.table(name).collect().toSeq
  }

  test("streaming as-of matches batch AsOf.join on in-order arrival") {
    import spark.implicits._
    val trades = Seq(
      Trade("A", 10, 1), Trade("C", 5, 4), Trade("A", 25, 2), Trade("B", 15, 3))
    val quotes = Seq(
      Quote("A", 5, 1.0), Quote("A", 10, 1.1), Quote("A", 20, 1.2),
      Quote("B", 15, 2.0))

    // rights arrive in event-time order relative to the lefts they match
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 5, 1.0), Quote("A", 10, 1.1)),
        trades = Seq(Trade("A", 10, 1), Trade("C", 5, 4))),
      Step(quotes = Seq(Quote("A", 20, 1.2), Quote("B", 15, 2.0)),
        trades = Seq(Trade("A", 25, 2), Trade("B", 15, 3)))),
      name = "asof_inorder")
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(4)).map(_ => r.getDouble(5)))).toSet

    val batch = graft.plans.AsOf.join(
      trades.toDF(), quotes.toDF(), "sym", "sym", "t", "qt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(4)).map(_ => r.getDouble(5)))).toSet

    // A@10 -> quote@10 (non-strict), A@25 -> quote@20, B@15 -> quote@15,
    // C@5 -> no quote (null right)
    assert(got == batch)
    assert(got == Set(
      ("A", 10L, Some(1.1)), ("A", 25L, Some(1.2)),
      ("B", 15L, Some(2.0)), ("C", 5L, None)))
  }

  test("strict excludes the equal-time right, matching the earlier one") {
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 5, 1.0), Quote("A", 10, 1.1))),
      Step(trades = Seq(Trade("A", 10, 1)))),
      strict = true, name = "asof_strict")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(5))).toSet
    // the @10 quote must NOT match the @10 trade; the retained
    // strictly-earlier @5 quote does — the two-slot state's raison d'etre
    assert(got == Set(("A", 10L, 1.0)))
  }

  test("state carries the last right across micro-batches") {
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 10, 1.0), Quote("A", 20, 1.5))),
      Step(trades = Seq(Trade("A", 30, 1), Trade("B", 30, 2)))),
      name = "asof_xbatch")
      .map(r => (r.getString(0), Option(r.get(4)).map(_ => r.getDouble(5))))
      .toSet
    // batch 1 installed A's last quote (t=20) in state; the batch-2
    // trade matches it; B never saw a quote -> null right
    assert(got == Set(("A", Some(1.5)), ("B", None)))
  }

  test("one-step-late left falls back to the retained earlier right") {
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 10, 1.1), Quote("A", 20, 1.2))),
      Step(trades = Seq(Trade("A", 15, 1)))),
      name = "asof_late")
      .map(r => (r.getLong(1), r.getDouble(5))).toSet
    // trade@15 arrives after quote@20 was installed as latest; the
    // correct match is the RETAINED prev quote@10, not null
    assert(got == Set((15L, 1.1)))
  }

  test("tolerance bounds the match age; stale rights never displace state") {
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 90, 1.0))),
      Step(quotes = Seq(Quote("A", 80, 0.5))),
      Step(trades = Seq(Trade("A", 100, 1), Trade("A", 200, 2)))),
      tolerance = Some(15L), name = "asof_tol")
      .map(r => (r.getLong(1), Option(r.get(4)).map(_ => r.getDouble(5))))
      .toSet
    // the batch-2 quote (t=80) is older than the latest (t=90): it only
    // fills the prev slot. trade@100 matches quote@90 (age 10 <= 15);
    // trade@200's candidate is 110 old -> null right under tolerance
    assert(got == Set((100L, Some(1.0)), (200L, None)))
  }

  test("timestamp time columns convert to micros; colliding names suffix _r") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val lIn = MemoryStream[(String, Long, Long)] // sym, t_us, qty
    val rIn = MemoryStream[(String, Long, Double)] // sym, t_us, px
    val lDF = lIn.toDF().toDF("sym", "ts", "qty")
      .withColumn("ts", timestamp_micros(col("ts")))
    val rDF = rIn.toDF().toDF("sym", "ts", "px")
      .withColumn("ts", timestamp_micros(col("ts")))
    val joined = StreamingAsOf.join(lDF, rDF, "sym", "ts", "ts")
    assert(joined.columns.toSeq ==
      Seq("sym", "ts", "qty", "sym_r", "ts_r", "px"))
    val ckpt = Files.createTempDirectory("graft-asof-ckpt").toString
    val q = joined.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("asof_ts").start()
    rIn.addData(("A", 1000000L, 42.0))
    q.processAllAvailable()
    lIn.addData(("A", 1000001L, 7L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_ts").collect()
    assert(got.length == 1 && got.head.getDouble(5) == 42.0)
  }

  test("maxLateness drops and counts events beyond the bound; within-bound stays monotone") {
    val late = spark.sparkContext.longAccumulator("asof_late")
    val got = run(Seq(
      Step(quotes = Seq(Quote("A", 100, 1.0))),
      Step(trades = Seq(Trade("A", 120, 1))),
      // quote@40 is beyond the bound (40 < 120 - 50): dropped+counted;
      // quote@90 is out of order but WITHIN the bound: admitted into
      // the prev slot (90 < latest 100 — the monotone guard)
      Step(quotes = Seq(Quote("A", 40, 9.9), Quote("A", 90, 0.9))),
      // trade@60 is beyond the bound: dropped+counted, NO output row
      // (not even a null-right one)
      Step(trades = Seq(Trade("A", 60, 2))),
      // trade@95 is within the bound: falls back to the admitted
      // quote@90 (latest quote@100 is in its future)
      Step(trades = Seq(Trade("A", 95, 3)))),
      name = "asof_lateness", maxLateness = Some(50L), lateEvents = Some(late))
      .map(r => (r.getLong(1), Option(r.get(4)).map(_ => r.getDouble(5))))
      .toSet
    assert(got == Set((120L, Some(1.0)), (95L, Some(0.9))),
      s"expected the two in-bound trades only, got $got")
    assert(late.value === 2L, "exactly quote@40 and trade@60 are late")
  }
}

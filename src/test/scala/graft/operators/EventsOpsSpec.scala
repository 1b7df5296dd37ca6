package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the event-analytics tier's ordered operators (the
  * oracle checks exact values; these pin the semantic shape). */
class EventsOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q135 funnel: step times strictly ascend, steps column matches nullness") {
    val rows = EventsOps.q135Funnel.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getAs[java.sql.Timestamp]("t_signup"),
        r.getAs[java.sql.Timestamp]("t_view"),
        r.getAs[java.sql.Timestamp]("t_purchase"))
      val steps = r.getAs[Long]("steps")
      // later steps require earlier ones, strictly later in time
      if (t3 != null) { assert(t2 != null && t3.after(t2)) }
      if (t2 != null) { assert(t1 != null && t2.after(t1)) }
      assert(steps === Seq(t1, t2, t3).count(_ != null).toLong)
    }
    // the funnel narrows
    val byStep = rows.groupBy(_.getAs[Long]("steps")).view.mapValues(_.length)
    val reached = (0 to 3).map(k => rows.count(_.getAs[Long]("steps") >= k))
    assert(reached.zip(reached.tail).forall { case (a, b) => a >= b })
    assert(byStep.values.sum === rows.length)
  }

  test("q136 retention: offset-0 row equals cohort size; actives never exceed it") {
    val rows = EventsOps.q136Retention.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.foreach { case (day, rs) =>
      val zero = rs.find(_.getAs[Long]("day_offset") === 0L)
      assert(zero.isDefined, s"cohort $day missing its offset-0 row")
      val size = zero.get.getAs[Long]("n_users")
      rs.foreach { r =>
        assert(r.getAs[Long]("day_offset") >= 0L, "activity before the cohort day")
        assert(r.getAs[Long]("n_users") <= size,
          s"cohort $day retains more users than it has")
      }
    }
    // total cohort sizes cover every user exactly once
    val users = graft.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    val cohortTotal = byCohort.values
      .map(_.find(_.getAs[Long]("day_offset") === 0L).get.getAs[Long]("n_users")).sum
    assert(cohortTotal === users)
  }

  test("q137 transitions: rows normalize per from-state; counts cover every consecutive pair") {
    val rows = EventsOps.q137Transitions.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pSum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"from-state $from probabilities sum to $pSum")
      rs.foreach(r => assert(r.getAs[Long]("n_trans") > 0L))
    }
    // each user contributes exactly (events - 1) transitions
    val e = graft.Tables.load(spark, dir, "events")
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_trans")).sum === expected)
  }

  test("q138 sliding windows: 4x fan-out conserved, starts on the 15-minute grid") {
    val rows = EventsOps.q138SlidingWindows.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.Tables.load(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === 4L * total,
      "every event must land in exactly duration/slide = 4 windows")
    rows.foreach { r =>
      val start = r.getAs[java.sql.Timestamp]("window_start")
      assert(start.getTime % (15 * 60 * 1000L) === 0L, s"window start $start off-grid")
    }
  }

  test("q180: z-scores are self-consistent and the 3-sigma flag matches") {
    val rows = EventsOps.q180RateAnomaly.fn(spark, dir).collect()
    assert(rows.nonEmpty, "sf0.001 events must yield scored buckets")
    rows.foreach { r =>
      val (n, mu, sd, z, fl) = (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6))
      assert(sd > 0.0)
      // reported z agrees with the reported (rounded) mu/sd to rounding slack
      assert(math.abs(z - (n - mu) / sd) < 1e-2, s"z drift at ${r.get(1)}")
      // the flag agrees with z except within rounding distance of 3.0
      if (math.abs(math.abs(z) - 3.0) > 1e-2)
        assert(fl === (math.abs(z) > 3.0), s"flag mismatch at ${r.get(1)}")
    }
    // baselines exclude the current bucket: a bucket far above its mu
    // must not have dragged its own mu up to itself
    val spikes = rows.filter(_.getBoolean(6))
    spikes.foreach { r =>
      assert(math.abs(r.getLong(2) - r.getDouble(3)) > 3.0 * r.getDouble(4) - 1e-6)
    }
  }

  test("q180 streaming twin: 3 micro-batches with split buckets equal the batch verdicts") {
    val events = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
    val ids = events.select(col("event_id")).collect().map(_.getLong(0)).sorted
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val mon = new graft.streaming.RateAnomaly()
    // arbitrary id cuts: hour buckets straddle batch boundaries, so the
    // fold's bucket-count addition is genuinely exercised
    mon.observe(events.filter(col("event_id") <= c1))
    mon.observe(events.filter(col("event_id") > c1 && col("event_id") <= c2))
    mon.observe(events.filter(col("event_id") > c2))
    val stream = mon.verdicts(includeOpen = true)
      .map(v => (v._1, v._2) -> v).toMap
    val batch = EventsOps.q180RateAnomaly.fn(spark, dir).collect()
    assert(batch.length === stream.size,
      s"bucket sets differ: batch ${batch.length} vs stream ${stream.size}")
    batch.foreach { r =>
      val key = (r.getString(0), r.getTimestamp(1).getTime)
      val v = stream(key)
      assert(v._3 === r.getLong(2), s"count at $key")
      assert(math.abs(v._4 - r.getDouble(3)) < 2e-4, s"mu at $key")
      assert(math.abs(v._5 - r.getDouble(4)) < 2e-4, s"sd at $key")
      assert(math.abs(v._6 - r.getDouble(5)) < 2e-3, s"z at $key")
      assert(v._7 === r.getBoolean(6), s"flag at $key")
    }
  }

  test("q180 streaming twin: default verdicts withhold the open trailing bucket and never flip") {
    import spark.implicits._
    // 22 in-order hourly buckets of ~10 events (varied so sd > 0),
    // then a trailing hour
    // whose events arrive SPLIT across two micro-batches: 2 events in
    // batch 1, 98 more in batch 2 (a spike once complete)
    val hourUs = 3600L * 1000000L
    def evts(hours: Seq[(Int, Int)]) = hours.flatMap { case (h, n) =>
      (0 until n).map(i => (h.toLong * 10000 + i,
        new java.sql.Timestamp(h * hourUs / 1000L + i), "click"))
    }.toDF("event_id", "ts", "event_type")
    val mon = new graft.streaming.RateAnomaly()
    mon.observe(evts((0 until 22).map(h => (h, 9 + h % 3)) :+ (22, 2)))
    val mid = mon.verdicts().map(v => v._2 -> v).toMap
    // hour 22 is the maximal observed hour: still open, withheld
    assert(!mid.contains(22L * hourUs / 1000L),
      "open trailing bucket must not be scored")
    assert(mid.nonEmpty, "closed buckets with enough history must be scored")
    // a premature includeOpen read WOULD have scored the split bucket
    // at n = 2 — the flip the default contract prevents
    val premature = mon.verdicts(includeOpen = true)
      .find(_._2 == 22L * hourUs / 1000L).get
    assert(premature._3 === 2L)
    mon.observe(evts(Seq((22, 98))))
    val fin = mon.verdicts(includeOpen = true).map(v => v._2 -> v).toMap
    // every default-emitted verdict is unchanged by the late batch...
    mid.foreach { case (h, v) => assert(fin(h) === v, s"verdict flipped at hour $h") }
    // ...and the completed bucket scores at its full merged count
    val done = fin(22L * hourUs / 1000L)
    assert(done._3 === 100L)
    assert(done._7, "completed 100-event bucket over a 10/hour baseline must flag")
  }

  test("q196 same-ts: a touch at the purchase's exact ts attributes regardless of event_id") {
    import spark.implicits._
    // purchase event_id 5 at t=1000; touches: a click at the SAME ts
    // with a GREATER event_id (9), and an older view (id 1, t=900).
    // Non-strict as-of must pick the same-ts click (ts tie beats the
    // earlier view; event_id plays no eligibility role) — the edge the
    // ROWS-frame oracle would get wrong without touches-first ordering.
    val purchases = Seq((5L, 7L, 1000L, 10.0))
      .toDF("event_id", "user_id", "purchase_ts", "value")
    val touches = Seq(
      (1L, 7L, 900L, "view"),
      (9L, 7L, 1000L, "click"))
      .toDF("touch_id", "touch_user", "touch_ts", "touch_type")
    val joined = graft.plans.AsOf.join(purchases, touches,
      "user_id", "touch_user", "purchase_ts", "touch_ts",
      rightTiebreak = Some("touch_id"), tolerance = Some(3600L))
      .select("event_id", "touch_id", "touch_type").collect()
    assert(joined.length === 1)
    assert(joined(0).getLong(1) === 9L, "same-ts touch must win over the older view")
    assert(joined(0).getString(2) === "click")
    // and among several same-ts touches the greatest touch_id wins
    val touches2 = touches.union(Seq((3L, 7L, 1000L, "view"))
      .toDF("touch_id", "touch_user", "touch_ts", "touch_type"))
    val j2 = graft.plans.AsOf.join(purchases, touches2,
      "user_id", "touch_user", "purchase_ts", "touch_ts",
      rightTiebreak = Some("touch_id"), tolerance = Some(3600L))
      .select("touch_id").collect()
    assert(j2(0).getLong(0) === 9L)
  }

  test("q217: S statistic replays from a driver-side pair count; a crafted monotone series flags") {
    val rows = EventsOps.q217MannKendall.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = daily(et).sortBy(_._2).map(_._3)
      assert(r.getLong(1) === xs.length.toLong)
      var sStat = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length)
        sStat += java.lang.Long.signum(xs(j) - xs(i))
      assert(r.getLong(2) === sStat, s"S drift for $et")
      val n = xs.length.toDouble
      val tie = xs.groupBy(identity).values
        .map(g => g.length.toDouble * (g.length - 1) * (2 * g.length + 5)).sum
      val varS = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
      val z = if (sStat > 0) (sStat - 1) / math.sqrt(varS)
        else if (sStat < 0) (sStat + 1) / math.sqrt(varS) else 0.0
      assert(math.abs(r.getDouble(4) - z) < 1e-6, s"Z drift for $et")
      assert(r.getString(5) ===
        (if (math.abs(z) > 1.96) { if (sStat > 0) "increasing" else "decreasing" }
         else "none"))
    }
    // sanity: a strictly increasing 30-day series must flag as increasing
    val xs = (1L to 30L).toArray
    var sPos = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sPos += java.lang.Long.signum(xs(j) - xs(i))
    val varPos = (30.0 * 29 * 65) / 18.0
    assert((sPos - 1) / math.sqrt(varPos) > 1.96)
  }

  test("q218: CUSUM replays from the daily series; a crafted level shift is localized") {
    val rows = EventsOps.q218CusumChangepoint.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = daily(r.getString(0)).sortBy(_._2).map(_._3)
      val n = xs.length
      val mean = xs.sum.toDouble / n
      val cums = xs.scanLeft(0L)(_ + _).tail
      val cks = cums.zipWithIndex.map { case (c, i) =>
        c.toDouble - (i + 1).toDouble * mean }
      val kStar = cks.zipWithIndex.maxBy { case (c, i) => (math.abs(c), -i) }._2
      assert(r.getLong(3) === (kStar + 1).toLong, s"cp_k drift for ${r.getString(0)}")
      val sd = math.sqrt(xs.map(x => x.toDouble * x).sum / n - mean * mean)
      val t = math.abs(cks(kStar)) / (sd * math.sqrt(n.toDouble))
      assert(math.abs(r.getDouble(5) - t) < 1e-6)
      assert(r.getBoolean(6) === (t > 1.358))
    }
    // crafted: 15 days at 10/day then 15 at 30/day — the bridge peaks
    // exactly at the shift and the statistic clears the 5% bar
    val shifted = Array.fill(15)(10L) ++ Array.fill(15)(30L)
    val m = shifted.sum.toDouble / 30
    val cks = shifted.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (c, i) => c.toDouble - (i + 1) * m }
    val kS = cks.zipWithIndex.maxBy { case (c, i) => (math.abs(c), -i) }._2
    assert(kS === 14, "changepoint must land on the last pre-shift day")
    val sd = math.sqrt(shifted.map(x => x.toDouble * x).sum / 30 - m * m)
    assert(math.abs(cks(kS)) / (sd * math.sqrt(30.0)) > 1.358)
  }

  test("q221: Theil-Sen replays from driver-side pairwise slopes; exact on a linear series") {
    val rows = EventsOps.q221TheilSen.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    def lowerMedian(vs: Seq[Double]): Double = {
      val sorted = vs.sorted
      sorted((vs.length + 1) / 2 - 1)
    }
    rows.foreach { r =>
      val xs = daily(r.getString(0)).sortBy(_._2).map(_._3)
      val slopes = for (i <- xs.indices; j <- (i + 1) until xs.length)
        yield (xs(j) - xs(i)).toDouble / (j - i).toDouble
      val beta = lowerMedian(slopes)
      assert(math.abs(r.getDouble(1) - beta) < 1e-6, s"beta for ${r.getString(0)}")
      val alpha = lowerMedian(xs.toSeq.zipWithIndex
        .map { case (x, i) => x.toDouble - beta * (i + 1).toDouble })
      assert(math.abs(r.getDouble(2) - alpha) < 1e-6, s"alpha for ${r.getString(0)}")
    }
    // exact recovery on a noiseless line x_k = 2k + 3
    val line = (1 to 11).map(k => 2.0 * k + 3.0)
    val ms = for (i <- line.indices; j <- (i + 1) until line.length)
      yield (line(j) - line(i)) / (j - i).toDouble
    assert(lowerMedian(ms) === 2.0)
    assert(lowerMedian(line.zipWithIndex.map { case (x, i) =>
      x - 2.0 * (i + 1) }) === 3.0)
  }
}

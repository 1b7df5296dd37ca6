package graft.plans

import graft.SparkSpec
import graft.operators.EventsOps
import org.apache.spark.sql.functions._

/** Contract for the custom as-of join operator (logical node →
  * strategy → physical exec). The oracle gate (q139 vs q61's DuckDB
  * SQL) proves values; these pin the semantics the gate can't see —
  * tie handling, nulls, unmatched keys — and the plan shape the 100 TB
  * design relies on. */
class AsOfJoinPlanSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  test("native as-of equals the window-form composition on real data") {
    val native = EventsOps.q139AsofNative.fn(spark, dir).collect()
    val window = EventsOps.q61AsofJoin.fn(spark, dir).collect()
    assert(native.length === window.length)
    native.zip(window).foreach { case (n, w) =>
      assert(n.getAs[Long]("event_id") === w.getAs[Long]("event_id"))
      assert(n.getAs[java.sql.Timestamp]("last_err_ts") ===
        w.getAs[java.sql.Timestamp]("last_err_ts"))
    }
  }

  test("plan: AsOfJoinExec replaces the window; both sides cluster on the key") {
    val df = EventsOps.q139AsofNative.fn(spark, dir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), "custom exec missing from the plan")
    assert(!plan.contains("Window"), "window form leaked into the native plan")
    assert(plan.contains("hashpartitioning(user_id") &&
      plan.contains("hashpartitioning(err_user"),
      "children must co-partition on their keys")
  }

  test("semantics: inclusive vs strict ties, unmatched keys, null times") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "q-a"),
      (1L, ts("2024-01-01 10:05:00"), "q-b"),
      (2L, ts("2024-01-01 09:00:00"), "q-c"))
      .toDF("qk", "qts", "quote")
    val trades = Seq(
      (1L, Option(ts("2024-01-01 10:05:00")), "t-tie"),   // ties q-b exactly
      (1L, Option(ts("2024-01-01 10:04:59")), "t-mid"),   // between a and b
      (1L, Option(ts("2024-01-01 09:59:59")), "t-early"), // before any quote
      (3L, Option(ts("2024-01-01 12:00:00")), "t-nokey"), // key has no quotes
      (1L, Option.empty[java.sql.Timestamp], "t-nots"))   // null time
      .toDF("tk", "tts", "trade")

    val inclusive = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts")
      .select(col("trade"), col("quote")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inclusive("t-tie") === "q-b",   "inclusive match takes the equal-time row")
    assert(inclusive("t-mid") === "q-a",   "latest at-or-before wins")
    assert(inclusive("t-early") === null,  "no quote at or before")
    assert(inclusive("t-nokey") === null,  "unmatched key stays null")
    assert(inclusive("t-nots") === null,   "null time never matches")

    val strict = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts", strict = true)
      .select(col("trade"), col("quote")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(strict("t-tie") === "q-a", "strict mode must exclude the equal-time row")
    assert(strict("t-mid") === "q-a")
  }

  test("self-join inputs (shared expr ids) are re-aliased, not mis-bound") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "x"),
      (1L, ts("2024-01-01 11:00:00"), "y"))
      .toDF("k", "t", "v")
    val out = AsOf.join(base, base, "k", "k", "t", "t", strict = true)
      .toDF("k", "t", "v", "rk", "rt", "rv")
    val row = out.filter(col("v") === "y").collect().head
    // y's strict as-of against the same frame is x
    assert(row.getAs[String]("rv") === "x")
  }

  test("rightTiebreak pins which equal-(key,time) right row is matched") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2024-01-01 10:00:00")
    // three quotes at the SAME (key, time) — without a tiebreak the
    // winner is whichever the partition sort placed last (unspecified)
    val quotes = Seq((1L, t0, 30L, "q-hi"), (1L, t0, 10L, "q-lo"),
      (1L, t0, 20L, "q-mid")).toDF("qk", "qts", "qid", "quote")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "t"))
      .toDF("tk", "tts", "trade")
    (1 to 3).foreach { _ =>
      val got = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts",
          rightTiebreak = Some("qid"))
        .select(col("quote")).collect().head.getString(0)
      assert(got === "q-hi", "greatest tiebreak value must win")
    }
  }

  test("metrics: numOutputRows and numMatched surface on the exec node") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), "q"))
      .toDF("qk", "qts", "quote")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t-hit"),
      (1L, ts("2024-01-01 09:30:00"), "t-early"),
      (2L, ts("2024-01-01 12:00:00"), "t-nokey"))
      .toDF("tk", "tts", "trade")
    // AQE off so the exec node (and its metrics) sits in executedPlan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts")
      df.collect()
      val exec = df.queryExecution.executedPlan
        .collectFirst { case a: AsOfJoinExec => a }
        .getOrElse(fail("AsOfJoinExec not in executed plan"))
      assert(exec.metrics("numOutputRows").value === 3L)
      assert(exec.metrics("numMatched").value === 1L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tolerance: a stale match is dropped, a fresh one kept, bound is inclusive") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "q-old"),
      (2L, ts("2024-01-01 10:00:00"), "q-new"))
      .toDF("qk", "qts", "quote")
    val trades = Seq(
      (1L, ts("2024-01-01 10:20:00"), "t-stale"),  // 20 min after q-old
      (2L, ts("2024-01-01 10:10:00"), "t-edge"),   // exactly 10 min: inclusive
      (2L, ts("2024-01-01 10:05:00"), "t-fresh"))
      .toDF("tk", "tts", "trade")
    val tol = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts",
        tolerance = Some(600L * 1000000L))
      .select(col("trade"), col("quote")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tol("t-stale") === null, "out-of-tolerance match must drop to null")
    assert(tol("t-edge") === "q-new", "the tolerance bound is inclusive")
    assert(tol("t-fresh") === "q-new")
    // without the tolerance the stale quote matches — same data, same op
    val no = AsOf.join(trades, quotes, "tk", "qk", "tts", "qts")
      .select(col("trade"), col("quote")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(no("t-stale") === "q-old")
  }

  test("tolerance: q149 equals the masked window form; negative tolerance rejected") {
    val native = EventsOps.q149AsofTolerance.fn(spark, dir).collect()
    val masked = EventsOps.q61AsofJoin.fn(spark, dir)
      .withColumn("recent_err_ts",
        when(col("purchase_ts").cast("long") - col("last_err_ts").cast("long")
          <= 600L, col("last_err_ts")))
      .orderBy(col("event_id")).collect()
    assert(native.length === masked.length)
    native.zip(masked).foreach { case (n, m) =>
      assert(n.getAs[Long]("event_id") === m.getAs[Long]("event_id"))
      assert(n.getAs[java.sql.Timestamp]("recent_err_ts") ===
        m.getAs[java.sql.Timestamp]("recent_err_ts"))
    }
    // tolerance must discriminate on this data or the test proves nothing
    val withErr = native.count(_.getAs[java.sql.Timestamp]("recent_err_ts") != null)
    val allMatched = EventsOps.q139AsofNative.fn(spark, dir)
      .filter(col("last_err_ts").isNotNull).count()
    assert(withErr < allMatched, "tolerance dropped nothing — widen the test window")
    assert(withErr > 0, "tolerance dropped everything")
    intercept[IllegalArgumentException] {
      EventsOps.q149AsofTolerance // construction is lazy; build a bad one directly
      val e = graft.Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsOf.join(e, e, "user_id", "user_id", "ts", "ts",
        tolerance = Some(-1L)).collect()
    }
  }

  test("every left row survives exactly once (left-outer cardinality)") {
    val e = graft.Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("ts").as("ets"))
    val joined = AsOf.join(purchases, errors, "user_id", "eu", "pts", "ets")
    assert(joined.count() === purchases.count())
    assert(joined.select(col("event_id")).distinct().count() === purchases.count())
  }
}

package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (SURVEY.md §2.6, §2.10 T3-T4 and the join
  * shapes the engine inherits): sessionization, as-of join, interval/range
  * join, pivot, cube. These are the batch duals of the Structured
  * Streaming operators in graft.streaming.
  *
  * Scale notes: every window partitions by user_id (the natural shuffle
  * key — no global sort); the as-of join is the forward-fill window form
  * (O(n log n) per key) rather than a quadratic range join; the range join
  * keeps an equi-key (user_id) so Spark plans sort-merge, not
  * nested-loop.
  */
object EventsOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** T4/session windows: 30-minute-gap sessionization per user (batch
    * form of session_window; lag → flag → running sum). */
  val q60Sessionize: QueryDef = QueryDef(
    "q60_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("session_value"),
          min(col("ts")).as("session_start"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""SELECT user_id, session_id, count(*) AS n_events,
      round(sum(value), 2) AS session_value,
      CAST(min(ts) AS TIMESTAMP) AS session_start FROM (
        SELECT user_id, ts, value,
          CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, event_id, ts, value,
            CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                 THEN 1 ELSE 0 END AS new_session
          FROM events) f) g
      GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
    headline = true)

  /** As-of join (forward-fill window form): each purchase joined to the
    * most recent prior error of the same user. */
  val q61AsofJoin: QueryDef = QueryDef(
    "q61_asof_join",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("err_ts", when(col("event_type") === "error", col("ts")))
        .withColumn("last_err_ts", last(col("err_ts"), ignoreNulls = true).over(byUser))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("last_err_ts"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      CAST(ts AS TIMESTAMP) AS purchase_ts,
      CAST(last_err_ts AS TIMESTAMP) AS last_err_ts FROM (
        SELECT event_id, user_id, ts, event_type,
          last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_err_ts
        FROM events) x
      WHERE event_type = 'purchase' ORDER BY event_id"""))

  /** Interval/range join with an equi-key: events within 5 minutes after
    * each error for the same user (sort-merge-able, never nested-loop). */
  val q62RangeJoin: QueryDef = QueryDef(
    "q62_range_join",
    (s, dir) => {
      val e = ev(s, dir)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id").as("err_user"), col("ts").as("err_ts"))
      val others = e.select(col("event_id"), col("user_id"), col("ts"))
      errors.join(others,
          col("err_user") === col("user_id") &&
            col("event_id") =!= col("err_id") &&
            col("ts") >= col("err_ts") &&
            unix_timestamp(col("ts")) - unix_timestamp(col("err_ts")) <= 300)
        .groupBy(col("err_id"))
        .agg(count(lit(1)).as("n_following"))
        .orderBy(col("err_id"))
    },
    Some("""SELECT e.event_id AS err_id, count(*) AS n_following
      FROM events e JOIN events o
        ON e.user_id = o.user_id AND o.event_id <> e.event_id
          AND o.ts >= e.ts AND epoch(o.ts) - epoch(e.ts) <= 300
      WHERE e.event_type = 'error'
      GROUP BY e.event_id ORDER BY err_id"""))

  /** Pivot: daily event counts, one column per event type. */
  val q63Pivot: QueryDef = QueryDef(
    "q63_pivot",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy(col("day")),
    Some("""SELECT CAST(ts AS DATE) AS day,
      count(*) FILTER (WHERE event_type = 'click') AS click,
      count(*) FILTER (WHERE event_type = 'error') AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup') AS signup,
      count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY 1 ORDER BY day"""))

  /** Cube over (event_type, weekday) with explicit null-ordering. */
  val q64Cube: QueryDef = QueryDef(
    "q64_cube",
    (s, dir) =>
      ev(s, dir)
        .withColumn("weekday", dayofweek(col("ts")).cast("long"))
        .cube(col("event_type"), col("weekday"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
        .orderBy(asc_nulls_first("event_type"), asc_nulls_first("weekday")),
    Some("""SELECT event_type, weekday, count(*) AS n,
      round(sum(value), 2) AS total_value FROM (
        SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday, value
        FROM events) e
      GROUP BY CUBE (event_type, weekday)
      ORDER BY event_type NULLS FIRST, weekday NULLS FIRST"""))

  val all: Seq[QueryDef] = Seq(
    q60Sessionize, q61AsofJoin, q62RangeJoin, q63Pivot, q64Cube)
}

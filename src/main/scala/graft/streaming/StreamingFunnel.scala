package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Streaming funnel progression — the incremental form of the q135
  * batch funnel (earliest signup → earliest view strictly after it →
  * earliest purchase strictly after that), maintained per user over
  * micro-batches with `mapGroupsWithState`.
  *
  * State is THREE epoch-micros timestamps per user (the completed
  * step times) — O(distinct users), independent of stream length, the
  * bounded footprint an unbounded event stream needs. Each batch's
  * rows are processed in event-time order, and the step rules are
  * monotone (a slot, once set, is final), so per-batch emissions are
  * a non-decreasing funnel snapshot per user and the LAST emission
  * equals the batch operator's row.
  *
  * Cross-batch contract (the StreamingAsOf one): exact when each
  * user's events arrive in event-time order across batches — a
  * signup arriving LATE with an earlier timestamp than the recorded
  * one cannot retroactively re-derive the later steps (set
  * watermarks to bound how late that can happen). The spec proves
  * stream == batch over in-order micro-batch cuts of the real events
  * table.
  */
object StreamingFunnel {

  /** Per-user funnel snapshots over a streaming (user_id, event_type,
    * ts, event_id) frame: (user_id, t1, t2, t3 epoch-micros nullable,
    * steps), one row per touched user per micro-batch (Update mode). */
  def progress(events: DataFrame): DataFrame = {
    val norm = events.select(
      col("user_id").cast("long").as("_u"),
      col("event_type").cast("string").as("_e"),
      unix_micros(col("ts").cast("timestamp")).as("_t"),
      col("event_id").cast("long").as("_id"))
    val outSchema = StructType(Seq(
      StructField("user_id", LongType, nullable = false),
      StructField("t_signup", LongType, nullable = true),
      StructField("t_view", LongType, nullable = true),
      StructField("t_purchase", LongType, nullable = true),
      StructField("steps", LongType, nullable = false)))
    val stateSchema = StructType(Seq(
      StructField("_t1", LongType), StructField("_t2", LongType),
      StructField("_t3", LongType)))
    val Unset = Long.MinValue
    norm
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .mapGroupsWithState[Row, Row](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Row], state: GroupState[Row]) =>
          var (t1, t2, t3) =
            if (state.exists) {
              val s = state.get
              (s.getLong(0), s.getLong(1), s.getLong(2))
            } else (Unset, Unset, Unset)
          rows.toSeq.sortBy(r => (r.getLong(2), r.getLong(3))).foreach { r =>
            val t = r.getLong(2)
            r.getString(1) match {
              case "signup" if t1 == Unset => t1 = t
              case "view" if t1 != Unset && t > t1 && t2 == Unset => t2 = t
              case "purchase" if t2 != Unset && t > t2 && t3 == Unset => t3 = t
              case _ => ()
            }
          }
          state.update(Row(t1, t2, t3))
          def opt(t: Long): Any = if (t == Unset) null else t
          val steps: Long =
            if (t3 != Unset) 3L else if (t2 != Unset) 2L
            else if (t1 != Unset) 1L else 0L
          Row(uid, opt(t1), opt(t2), opt(t3), steps)
      }(Encoders.row(stateSchema), Encoders.row(outSchema))
  }
}

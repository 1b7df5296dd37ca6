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
  * one cannot retroactively re-derive the later steps. `maxLateness`
  * ENFORCES the contract instead of documenting it: each user's
  * state carries its event-time high-water mark, an event older than
  * `hwm − maxLateness` is dropped and counted (never silently folded
  * into a state it can no longer be correct against), and an
  * out-of-order event WITHIN the bound is admitted under the monotone
  * step rules — it may set an empty earlier slot (a late signup
  * starts the funnel) but never reopens a filled one, and
  * already-seen later-step events are not re-derived (spec-pinned,
  * "late events: dropped beyond the bound, monotone within it").
  *
  * NOTE: the high-water mark widened the state row (3 → 4 fields);
  * restart pre-lateness checkpoints from scratch.
  */
object StreamingFunnel {

  /** Per-user funnel snapshots over a streaming (user_id, event_type,
    * ts, event_id) frame: (user_id, t1, t2, t3 epoch-micros nullable,
    * steps), one row per touched user per micro-batch (Update mode).
    *
    * @param maxLateness event-time lateness bound in micros: events
    *        older than the user's high-water mark minus this are
    *        dropped and counted in `lateEvents`. None = admit
    *        everything (the monotone rules still apply).
    * @param lateEvents  counter for dropped-late events (an
    *        accumulator so the driver can read it per batch). */
  def progress(events: DataFrame,
      maxLateness: Option[Long] = None,
      lateEvents: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
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
      StructField("_t3", LongType), StructField("_hwm", LongType)))
    val Unset = Long.MinValue
    val lateBound = maxLateness
    val lateAcc = lateEvents
    norm
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .mapGroupsWithState[Row, Row](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Row], state: GroupState[Row]) =>
          var (t1, t2, t3, hwm) =
            if (state.exists) {
              val s = state.get
              (s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3))
            } else (Unset, Unset, Unset, Unset)
          rows.toSeq.sortBy(r => (r.getLong(2), r.getLong(3))).foreach { r =>
            val t = r.getLong(2)
            val isLate = lateBound.exists(b => hwm != Unset && t < hwm - b)
            if (isLate) lateAcc.foreach(_.add(1L))
            else {
              r.getString(1) match {
                case "signup" if t1 == Unset => t1 = t
                case "view" if t1 != Unset && t > t1 && t2 == Unset => t2 = t
                case "purchase" if t2 != Unset && t > t2 && t3 == Unset => t3 = t
                case _ => ()
              }
              if (t > hwm) hwm = t
            }
          }
          state.update(Row(t1, t2, t3, hwm))
          def opt(t: Long): Any = if (t == Unset) null else t
          val steps: Long =
            if (t3 != Unset) 3L else if (t2 != Unset) 2L
            else if (t1 != Unset) 1L else 0L
          Row(uid, opt(t1), opt(t2), opt(t3), steps)
      }(Encoders.row(stateSchema), Encoders.row(outSchema))
  }
}

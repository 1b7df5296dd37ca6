package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming as-of join — the watermark-bounded incremental form of
  * `plans/AsOfJoin`: each left event is joined to the LAST right event of
  * the same key with right time <= (or < when `strict`) the left time,
  * maintained incrementally over micro-batches.
  *
  * Shape (Spark-first): both streams are tagged and unioned, grouped by
  * the join key, and merged in `flatMapGroupsWithState`. State is TWO
  * rows per key — the latest right event, plus the latest right event
  * strictly earlier than it (the candidate a `strict` left at the same
  * time, or a one-step-late left, falls back to) — so state size is
  * O(distinct keys), independent of stream length: the bounded footprint
  * a 1000-executor cluster needs on an unbounded stream. Within a
  * micro-batch, rows are merged in event-time order with the batch
  * operator's at-equal-time side priority (non-strict absorbs a right at
  * t before a left at t; strict does not), so a batch holding both sides
  * in any arrival order produces the batch operator's matches.
  *
  * Cross-batch semantics: exact whenever each key's rights arrive in
  * event-time order no more than one batch "ahead" of the lefts they
  * should match — the same kind of ordering contract Structured
  * Streaming's stream-stream outer join puts behind its watermark. A
  * right older than both retained rows is never absorbed (monotone
  * guard). `maxLateness` ENFORCES the contract: each key's state
  * carries its event-time high-water mark, and an event (either side)
  * older than `hwm − maxLateness` is dropped and counted — a late
  * left emits nothing rather than a match against state that has
  * already advanced past it; a late right is never absorbed. Events
  * out of order WITHIN the bound keep the documented monotone
  * behavior (spec-pinned with an out-of-order batch). Unmatched lefts
  * emit with null right columns (left-outer, like the batch
  * operator); `tolerance` bounds the match's age in the time column's
  * native units (micros for timestamps).
  *
  * NOTE: adding the high-water mark widened the state row (4 → 5
  * fields); a query restarted from a checkpoint written by the
  * pre-lateness version of this operator will fail to decode its
  * state — restart such streams from a fresh checkpoint.
  *
  * Reference behavior: merge_asof semantics over streams — pandas has no
  * streaming form; kdb's realtime `aj` against a keyed last-tick table
  * is exactly this state shape (latest right row per key).
  */
object StreamingAsOf {

  /** Join streaming `left` to streaming `right` as-of on `key`/time.
    *
    * Time columns must be integral (cast to long) or timestamp/date
    * (converted to epoch micros — the representation the batch
    * operator's tolerance subtracts in). Right columns colliding with a
    * left column name are suffixed `_r` in the output. Keys are grouped
    * on their canonical string form (integral/string keys round-trip
    * exactly).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      strict: Boolean = false,
      tolerance: Option[Long] = None,
      maxLateness: Option[Long] = None,
      lateEvents: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {

    def toMicros(df: DataFrame, c: String) = df.schema(c).dataType match {
      case TimestampType | TimestampNTZType | DateType =>
        unix_micros(col(c).cast("timestamp"))
      case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
      case other => throw new IllegalArgumentException(
        s"streaming as-of time column '$c' must be integral or timestamp, got $other")
    }

    val lSchema = left.schema
    val leftNames = left.columns.toSet
    val rOutNames = right.columns.map(c => if (leftNames(c)) s"${c}_r" else c)
    val rSchema = StructType(right.schema.fields.zip(rOutNames).map {
      case (f, n) => f.copy(name = n, nullable = true)
    })

    val lNorm = left.select(
      col(key).cast("string").as("_k"),
      toMicros(left, leftTime).as("_t"),
      lit(0).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(rSchema).as("_r"))
    val rNorm = right.select(
      col(key).cast("string").as("_k"),
      toMicros(right, rightTime).as("_t"),
      lit(1).as("_side"),
      lit(null).cast(lSchema).as("_l"),
      struct(right.columns.map(col).toIndexedSeq: _*).cast(rSchema).as("_r"))

    val outSchema = StructType(lSchema.fields ++ rSchema.fields)
    // (latest right, latest right strictly before it); t2 uses a
    // Long.MinValue sentinel when the prev slot is empty
    val stateSchema = StructType(Seq(
      StructField("_t1", LongType), StructField("_r1", rSchema),
      StructField("_t2", LongType), StructField("_r2", rSchema),
      StructField("_hwm", LongType)))
    val outEnc = Encoders.row(outSchema)
    val stateEnc = Encoders.row(stateSchema)
    val rWidth = rSchema.size
    val isStrict = strict
    val tol = tolerance

    lNorm.unionByName(rNorm)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroupsWithState[Row, Row](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Row], state: GroupState[Row]) =>
          var t1 = Long.MinValue
          var r1: Row = null
          var t2 = Long.MinValue
          var r2: Row = null
          var hwm = Long.MinValue
          if (state.exists) {
            val s = state.get
            t1 = s.getLong(0); r1 = s.getStruct(1)
            t2 = s.getLong(2); r2 = s.getStruct(3)
            hwm = s.getLong(4)
          }
          // at equal time: non-strict lets a right at t match a left at t
          // (right first); strict forbids it (left first) — the streaming
          // mirror of the batch merge's `c < 0 || (c == 0 && !isStrict)`
          val ordered = rows.toSeq.sortBy { r =>
            (r.getLong(1), if (isStrict) r.getInt(2) else 1 - r.getInt(2))
          }
          val out = Seq.newBuilder[Row]
          ordered.foreach { r =>
            val rowT = r.getLong(1)
            val isLate =
              maxLateness.exists(b => hwm != Long.MinValue && rowT < hwm - b)
            if (isLate) lateEvents.foreach(_.add(1L))
            else if (r.getInt(2) == 1) {
              val rt = r.getLong(1)
              if (r1 == null || rt > t1) {
                t2 = t1; r2 = r1; t1 = rt; r1 = r.getStruct(4)
              } else if (rt == t1) {
                r1 = r.getStruct(4) // later arrival wins the tie, prev keeps t2 < t1
              } else if (r2 == null || rt >= t2) {
                t2 = rt; r2 = r.getStruct(4) // a better strictly-earlier candidate
              } // else: older than both retained rows — never absorbed
            } else {
              val lt = r.getLong(1)
              def ok(t: Long) = if (isStrict) t < lt else t <= lt
              val cand: Row =
                if (r1 != null && ok(t1)) r1
                else if (r2 != null && ok(t2)) r2
                else null
              val candT = if (r1 != null && ok(t1)) t1 else t2
              val matched = cand != null && tol.forall(t => lt - candT <= t)
              val rSeq = if (matched) cand.toSeq else Seq.fill[Any](rWidth)(null)
              out += Row.fromSeq(r.getStruct(3).toSeq ++ rSeq)
            }
            if (!isLate && rowT > hwm) hwm = rowT
          }
          if (r1 != null || hwm != Long.MinValue)
            state.update(Row(t1, r1, t2, r2, hwm))
          out.result().iterator
      }(stateEnc, outEnc)
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T7: stateful in-flight file tracking — the reference's
  * active_file_manager (workers/shared/workflow/execution/
  * active_file_manager.py) as `flatMapGroupsWithState` keyed by content
  * hash: first sighting emits PROCESS, repeats within the state's
  * lifetime emit SKIP_IN_FLIGHT, and state expires on processing-time
  * timeout (the reference's stale-execution cleanup).
  */
object StatefulTracking {

  final case class FileEvent(file_hash: String, file_path: String, ts_ms: Long)
  final case class TrackDecision(file_hash: String, file_path: String, decision: String)
  // public: the state encoder's generated code constructs it reflectively
  final case class InFlight(firstPath: String, sinceMs: Long)

  /** timeoutMs > 0 enables processing-time state expiry (production:
    * stale-execution cleanup). NOTE it makes Spark schedule continuous
    * micro-batches to evaluate timeouts — pass 0 (NoTimeout) in
    * drive-to-quiescence tests or AvailableNow runs. */
  def decide(spark: SparkSession, events: Dataset[FileEvent],
      timeoutMs: Long = 3600 * 1000L): Dataset[TrackDecision] = {
    import spark.implicits._
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.file_hash)
      .flatMapGroupsWithState[InFlight, TrackDecision](
        OutputMode.Append, timeoutConf) {
        (hash: String, rows: Iterator[FileEvent], state: GroupState[InFlight]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(e => (e.ts_ms, e.file_path))
            val out = Seq.newBuilder[TrackDecision]
            batch.foreach { e =>
              if (state.exists) {
                out += TrackDecision(hash, e.file_path, "SKIP_IN_FLIGHT")
              } else {
                state.update(InFlight(e.file_path, e.ts_ms))
                if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
                out += TrackDecision(hash, e.file_path, "PROCESS")
              }
            }
            out.result().iterator
          }
      }
  }
}

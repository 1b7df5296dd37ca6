package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch event-rate anomaly monitor — the streaming twin of the
  * q180 batch operator (3-sigma control chart over a trailing 24-bucket
  * baseline per event type). Each micro-batch reduces DISTRIBUTED to
  * its (event_type, hour, n) bucket counts; the driver folds them into
  * O(types × 25) state and scores each completed bucket against the 24
  * buckets before it — the same arithmetic as the batch window, so the
  * stream's verdicts equal the batch operator's on the concatenated
  * input (spec-proven over micro-batch cuts).
  *
  * Bucket counts ADD across batches (a bucket split by a batch
  * boundary merges exactly), so the fold is associative the same way
  * CmsMonitor's grid is; scoring is deferred until a LATER bucket for
  * the type arrives, which is what makes the split-bucket case safe:
  * a bucket is only baselined/scored once no more events can join it
  * (event-time order per type is the q180 window's own assumption).
  */
final class RateAnomaly(histLen: Int = 24, minHist: Int = 12,
    sigma: Double = 3.0) {

  /** (event_type, hour-epoch-MILLIS — `Timestamp.getTime`'s unit) →
    * accumulated count. */
  private val state =
    scala.collection.mutable.Map[(String, Long), Long]()

  /** Fold one micro-batch of raw events (`event_type`, `ts` columns). */
  def observe(batchEvents: DataFrame): Unit = {
    val counts = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
    synchronized {
      counts.foreach { r =>
        val k = (r.getString(1), r.getTimestamp(0).getTime)
        state(k) = state.getOrElse(k, 0L) + r.getLong(2)
      }
    }
  }

  /** Score every CLOSED bucket with >= minHist trailing buckets —
    * identical output shape to q180: (event_type, hourMillis, n, mu,
    * sd, z, anomaly), rounded like the batch operator.
    *
    * By default each type's maximal observed hour is withheld: that
    * bucket may still be open (a later micro-batch can add events to
    * it), and a verdict emitted for it could flip — the deferred-
    * scoring contract above. Pass `includeOpen = true` only once the
    * source is exhausted (stream closed / final drain), where the
    * trailing bucket is complete by construction and the verdict set
    * equals the batch operator's on the full input. */
  def verdicts(includeOpen: Boolean = false)
      : Seq[(String, Long, Long, Double, Double, Double, Boolean)] =
    synchronized {
      state.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap { case (tpe, m) =>
        val buckets = m.toSeq.map { case ((_, h), n) => (h, n) }.sortBy(_._1)
        val scoreUpTo = if (includeOpen) buckets.length else buckets.length - 1
        buckets.indices.take(scoreUpTo).flatMap { i =>
          val hist = buckets.slice(math.max(0, i - histLen), i).map(_._2)
          if (hist.size < minHist) None
          else {
            val mu = hist.sum.toDouble / hist.size
            val variance =
              hist.map(x => (x - mu) * (x - mu)).sum / (hist.size - 1)
            val sd = math.sqrt(variance)
            if (sd <= 0.0) None
            else {
              val (h, n) = buckets(i)
              val z = (n - mu) / sd
              def r4(x: Double): Double =
                BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble
              Some((tpe, h, n, r4(mu), r4(sd), r4(z), math.abs(z) > sigma))
            }
          }
        }
      }
    }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.MisraGriesAgg

/** Cross-batch heavy-hitter monitoring for an incremental corpus: the
  * streaming twin of q133. Each micro-batch reduces to a k-counter
  * Misra-Gries summary INSIDE the cluster (the aggregate's map-side
  * combine — only a k-sized array ever reaches the driver), and the
  * driver folds it into one k-counter state with the identical
  * mergeable-summaries rule the aggregate uses between partitions.
  *
  * Guarantee composition (Agarwal et al.): merging per-batch
  * summaries keeps est ≤ f ≤ est + N/(k+1) for the TOTAL stream
  * length N, and a token with f > N/(k+1) can never vanish across
  * batch boundaries — so a crawl operator watching frequent tokens
  * (or boilerplate fragments, or domains) over a month of ingest
  * holds O(k) state forever, the same discipline as the offline-LM
  * and bloom-history streaming stages (EventStreams).
  */
object HeavyHitters {

  final class Monitor(val k: Int) {
    @volatile private var state = Map.empty[String, Long]

    /** Fold one micro-batch (a frame with a `token` column) into the
      * monitor. The per-batch summary is computed distributed; only
      * ≤ k (token, count) pairs cross to the driver. */
    def observe(batchTokens: DataFrame): Unit = {
      MisraGriesAgg.register(batchTokens.sparkSession)
      val rows = batchTokens
        .agg(expr(s"misra_gries(token, $k)").as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.est"))
        .collect()
      val batch = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
      synchronized { state = MisraGriesAgg.mergeSummaries(state, batch, k) }
    }

    /** Current summary, (est desc, token asc) like the aggregate. */
    def summary: Seq[(String, Long)] =
      state.toSeq.sortBy { case (t, c) => (-c, t) }
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch embedding-drift monitor: the streaming twin of q209's
  * quadratic-kernel MMD² audit, built on the same moment identity
  * (Gretton et al. 2012: MMD²_quad = ‖M_X−M_Y‖_F² + 2‖μ_X−μ_Y‖²).
  *
  * Each micro-batch reduces DISTRIBUTED to per-group moment partials —
  * count, Σq (d longs), Σqqᵀ upper triangle (d(d+1)/2 longs) — on the
  * ×1000 integer lattice the cluster tier standardizes on
  * (ClusterOps), and the driver folds them by ADDITION. Int64 addition
  * is exactly associative, so the cross-batch state equals the
  * one-shot moments over the concatenated stream BIT-FOR-BIT (the
  * CmsMonitor guarantee, applied to second moments); any group pair's
  * MMD² can then be read at any time without touching historical data.
  * Like the CMS twin (and unlike the idempotent HLL fold), replaying a
  * batch double-counts — drive it through the batch-id-fenced
  * `observe(batch, batchId)` from `foreachBatch`, which absorbs the
  * re-delivered last batch as a no-op and refuses regressed ids
  * ([[BatchFence]]).
  *
  * State per group: 1 + d + d(d+1)/2 longs (≈ 17 KiB at d = 64) —
  * forever, independent of stream length, and ≤ [[DriftMonitor
  * .MaxGroups]] groups total (≈ 70 MB at the defaults). A batch that
  * would push the group count past the bound REFUSES (throws) before
  * folding anything, rather than evicting: additive moment states are
  * not reconstructible after eviction, so silent eviction would turn
  * a high-cardinality key misconfiguration into wrong MMD² readings
  * — the QuantileMonitor discipline (r14 verdict item 6). Lattice
  * headroom: |q| ≤ ~10³
  * for unit-scale embeddings ⇒ |Σqq| < 10⁶·n, safe in int64 to
  * n ≈ 9·10¹² vectors per group.
  */
final class DriftMonitor(val dim: Int = 64,
    maxGroups: Int = DriftMonitor.MaxGroups) {

  /** (n, Σq, upper-triangle Σ q_i·q_j) per group key. */
  @volatile private var state =
    Map.empty[String, (Long, Array[Long], Array[Long])]

  private def triSize = dim * (dim + 1) / 2

  private val fence = new BatchFence("DriftMonitor")

  /** [[observe]] fenced by the `foreachBatch` batch id — the streaming
    * entry point: a re-delivery of the last committed batch (the crash
    * -recovery replay) is a counted no-op, so the additive moments
    * never double-count; a regressed id is refused by name. */
  def observe(batch: DataFrame, batchId: Long): Unit =
    fence(batchId)(observe(batch))

  /** Re-delivered batches absorbed by the fence. */
  def replaysSkipped: Long = fence.replaysSkipped

  /** Fold one micro-batch: a frame with `group` (string) and
    * `embedding` (array&lt;float/double&gt;) columns. Only
    * groups × (d + d²/2) longs cross to the driver. */
  def observe(batch: DataFrame): Unit = {
    val q = batch.select(col("group"),
      expr(s"transform(embedding, x -> cast(floor(cast(x as double) * 1000.0 + 0.5) as bigint))")
        .as("q"))
    val mu = q.select(col("group"), posexplode(col("q")).as(Seq("i0", "x")))
      .groupBy(col("group"), col("i0"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .collect()
    val mom = q.select(col("group"), explode(expr(
        s"""flatten(transform(sequence(1, $dim), i ->
           |  transform(sequence(i, $dim), j ->
           |    struct(i, j, element_at(q, i) * element_at(q, j) as xy))))""".stripMargin))
        .as("p"))
      .groupBy(col("group"), col("p.i"), col("p.j"))
      .agg(sum(col("p.xy")).as("sxy"))
      .collect()
    synchronized {
      // refuse BEFORE any fold so an over-bound batch leaves the
      // state untouched (every observed group appears in `mu`)
      val newGroups = mu.map(_.getString(0)).toSet -- state.keySet
      if (state.size + newGroups.size > maxGroups)
        throw new IllegalStateException(
          s"DriftMonitor: batch introduces ${newGroups.size} new groups " +
          s"(${state.size} tracked, bound $maxGroups) — the group key is " +
          "too high-cardinality for driver-side moment state (~17 KiB per " +
          "group at d=64); key on a coarser column or raise the " +
          "constructor bound")
      var next = state
      def entry(g: String) =
        next.getOrElse(g, (0L, new Array[Long](dim), new Array[Long](triSize)))
      // per-group counts arrive on every dimension row; take i0 == 0
      mu.foreach { r =>
        val g = r.getString(0)
        val (n, s, m) = entry(g)
        val i = r.getInt(1)
        s(i) += r.getLong(2)
        // every dimension row carries the group count; fold it once
        val n2 = if (i == 0) n + r.getLong(3) else n
        next += g -> ((n2, s, m))
      }
      mom.foreach { r =>
        val g = r.getString(0)
        val (n, s, m) = entry(g)
        val (i, j) = (r.getInt(1) - 1, r.getInt(2) - 1)
        // row-major upper-triangle offset
        m(i * dim - i * (i - 1) / 2 + (j - i)) += r.getLong(3)
        next += g -> ((n, s, m))
      }
      state = next
    }
  }

  /** Raw accumulated moments for a group (defensive copies). */
  def moments(group: String): Option[(Long, Array[Long], Array[Long])] =
    state.get(group).map { case (n, s, m) => (n, s.clone(), m.clone()) }

  /** MMD²_quad between two observed groups, from the accumulated
    * lattice moments (de-quantized): (meanDist², momentDist², mmd²). */
  def mmd2(a: String, b: String): Option[(Double, Double, Double)] =
    for ((na, sa, ma) <- state.get(a); (nb, sb, mb) <- state.get(b))
      yield {
        val meanD = (0 until dim).map { i =>
          val d = sa(i).toDouble / (1000.0 * na) - sb(i).toDouble / (1000.0 * nb)
          d * d
        }.sum
        var momD = 0.0
        var idx = 0
        for (i <- 0 until dim; j <- i until dim) {
          val d = ma(idx).toDouble / (1e6 * na) - mb(idx).toDouble / (1e6 * nb)
          momD += (if (i == j) 1.0 else 2.0) * d * d
          idx += 1
        }
        (meanD, momD, momD + 2.0 * meanD)
      }

  def groups: Seq[String] = state.keys.toSeq.sorted
}

object DriftMonitor {
  /** Default group-cardinality bound: per-group state is
    * 1 + d + d(d+1)/2 longs ≈ 17 KiB at d = 64, so 4096 groups cap
    * worst-case driver state at ≈ 70 MB — generous for the intended
    * keys (source/domain/shard), fatal-by-refusal for accidental
    * high-cardinality ones. */
  val MaxGroups = 4096
}

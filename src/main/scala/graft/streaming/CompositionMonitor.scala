package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-batch corpus-composition monitor: the streaming twin of the
  * q224 Benford audit and the q222/q229 source-mass family, on the
  * [[DriftMonitor]] discipline — each micro-batch reduces DISTRIBUTED
  * to integer grid partials (a 9-cell first-digit grid; a per-source
  * token-mass table), and the driver folds them by int64 ADDITION,
  * which is exactly associative: after any batch split the state
  * equals the one-shot grids over the concatenated stream
  * BIT-FOR-BIT, so the χ²/Gini/diversity reports are readable at any
  * time without touching historical data.
  *
  * State: 9 longs + one long per source, the source axis bounded by
  * [[CompositionMonitor.MaxSources]] — a batch that would push the
  * source count past the bound REFUSES (throws) before folding
  * anything, rather than evicting: additive mass states are not
  * reconstructible after eviction, so silent eviction would skew
  * every later Gini/diversity reading (the QuantileMonitor
  * discipline, r14 verdict item 6). Like the CMS/moment twins (and
  * unlike the idempotent HLL fold), replaying a batch double-counts
  * — drive each feed through its batch-id-fenced overload from
  * `foreachBatch`, which absorbs the re-delivered last batch as a
  * no-op and refuses regressed ids ([[BatchFence]]; one fence per
  * feed, since the two feeds are independent streaming queries with
  * independent batch-id sequences).
  */
final class CompositionMonitor(
    maxSources: Int = CompositionMonitor.MaxSources) {

  @volatile private var digitCounts: Map[Int, Long] = Map.empty
  @volatile private var sourceMass: Map[String, Long] = Map.empty

  private val amountsFence = new BatchFence("CompositionMonitor.observeAmounts")
  private val docsFence = new BatchFence("CompositionMonitor.observeDocs")

  /** [[observeAmounts]] fenced by the `foreachBatch` batch id — the
    * streaming entry point (replay no-op, regressed-id refusal). */
  def observeAmounts(batch: DataFrame, batchId: Long): Unit =
    amountsFence(batchId)(observeAmounts(batch))

  /** [[observeDocs]] fenced by the `foreachBatch` batch id. */
  def observeDocs(batch: DataFrame, batchId: Long): Unit =
    docsFence(batchId)(observeDocs(batch))

  /** Re-delivered batches absorbed by the two fences. */
  def replaysSkipped: Long =
    amountsFence.replaysSkipped + docsFence.replaysSkipped

  /** Fold one micro-batch of a numeric feed: `value` column (double,
    * two-decimal semantics — prices). Only 9 longs cross the wire. */
  def observeAmounts(batch: DataFrame): Unit = {
    val rows = batch.filter(col("value") > 0)
      .select(substring(round(col("value") * 100, 0)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .collect()
    synchronized {
      rows.foreach { r =>
        val d = r.getInt(0)
        digitCounts += d -> (digitCounts.getOrElse(d, 0L) + r.getLong(1))
      }
    }
  }

  /** Fold one micro-batch of documents: `source` + `text` columns.
    * Only (source, Σtokens) longs cross the wire. */
  def observeDocs(batch: DataFrame): Unit = {
    val rows = batch.filter(length(trim(col("text"))) > 0)
      .select(col("source"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("w"))
      .collect()
    synchronized {
      val newSources = rows.map(_.getString(0)).toSet -- sourceMass.keySet
      if (sourceMass.size + newSources.size > maxSources)
        throw new IllegalStateException(
          s"CompositionMonitor: batch introduces ${newSources.size} new " +
          s"sources (${sourceMass.size} tracked, bound $maxSources) — the " +
          "source key is too high-cardinality for driver-side mass state; " +
          "key on a coarser column or raise the constructor bound")
      rows.foreach { r =>
        val s = r.getString(0)
        sourceMass += s -> (sourceMass.getOrElse(s, 0L) + r.getLong(1))
      }
    }
  }

  /** Accumulated 9-cell digit grid (missing digits = 0). */
  def digitGrid: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> digitCounts.getOrElse(d, 0L))

  /** Accumulated per-source token mass. */
  def massGrid: Map[String, Long] = sourceMass

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** q224's report rows from the accumulated grid:
    * (digit, n, share, benford_p, chi2_term, chi2, rejected). */
  def benfordReport(): Seq[(Int, Long, Double, Double, Double, Double, Boolean)] = {
    val grid = digitGrid
    val total = grid.map(_._2).sum.toDouble
    val terms = grid.map { case (d, n) =>
      val p = math.log10(1.0 + 1.0 / d)
      val e = p * total
      (d, n, p, (n - e) * (n - e) / e)
    }
    val chi2 = terms.map(_._4).sum // digit-ascending fold order
    terms.map { case (d, n, p, t) =>
      (d, n, r6(n / total), r6(p), r6(t), r6(chi2), chi2 > 15.507)
    }
  }

  /** q229's report from the accumulated mass grid:
    * (n_sources, shannon_h, eff_h1, simpson, eff_h2, berger_parker). */
  def diversityReport(): (Long, Double, Double, Double, Double, Double) = {
    val ms = sourceMass.toSeq.sortBy(_._1) // fixed fold order
    val tot = ms.map(_._2).sum.toDouble
    val ps = ms.map(_._2 / tot)
    val h = -ps.map(p => p * math.log(p)).sum
    val simpson = ps.map(p => p * p).sum
    (ms.size.toLong, r6(h), r6(math.exp(h)), r6(simpson),
      r6(1.0 / simpson), r6(ps.max))
  }

  /** q222's corpus Gini from the accumulated mass grid (exact discrete
    * form over sources ranked ascending by mass, source tiebreak). */
  def giniReport(): Double = {
    val ranked = sourceMass.toSeq.sortBy { case (s, w) => (w, s) }
    val k = ranked.size.toLong
    val tot = ranked.map(_._2).sum
    val iw = ranked.zipWithIndex.map { case ((_, w), i) => (i + 1) * w }.sum
    r6(2.0 * iw.toDouble / (k.toDouble * tot.toDouble) -
      (k + 1).toDouble / k.toDouble)
  }
}

object CompositionMonitor {
  /** Default source-cardinality bound: one long (plus the key string)
    * per source keeps 100k sources at a few MB of driver state —
    * generous for corpus-source keys, fatal-by-refusal for accidental
    * per-document keys. */
  val MaxSources = 100000
}

package graft.streaming

/** Batch-id replay fence for ADDITIVE driver-side monitor folds
  * (DriftMonitor's moments, CompositionMonitor's grids).
  *
  * QuantileMonitor is replay-proof by construction (its min-k fold is
  * idempotent — folding the same rows twice picks the same k minima),
  * but int64-addition states double-count on replay. Structured
  * Streaming's recovery contract makes the hazard precise: after a
  * failure, `foreachBatch` may re-deliver exactly the LAST committed
  * batch, with the SAME batch id — so remembering one long per feed
  * closes it. Ids are fenced three ways:
  *
  *   - `batchId > last`  → fold, advance the fence;
  *   - `batchId == last` → counted NO-OP (the legitimate recovery
  *     replay — state provably unchanged);
  *   - `batchId < last`  → REFUSE by name: Structured Streaming never
  *     regresses batch ids within a query, so a smaller id means two
  *     queries are sharing one monitor (or a checkpoint was deleted),
  *     and an additive state fed out of order is unrecoverable — the
  *     same refuse-over-corrupt discipline as the cardinality bounds.
  *
  * The fold runs under the fence's lock: `foreachBatch` calls are
  * serial per query anyway, and check-then-fold must be atomic for
  * the fence to mean anything. */
private[streaming] final class BatchFence(owner: String) {
  private var last: Long = -1L
  private var skipped: Long = 0L

  def apply(batchId: Long)(fold: => Unit): Unit = synchronized {
    if (batchId == last) skipped += 1
    else if (batchId < last)
      throw new IllegalStateException(
        s"$owner: batch id $batchId regresses behind folded id $last — " +
        "batch ids are monotone within a streaming query, so a regressed " +
        "id means a shared monitor or a deleted checkpoint; an additive " +
        "state folded out of order is unrecoverable. The fence only " +
        "absorbs re-delivery of the last committed batch.")
    else { fold; last = batchId }
  }

  /** Re-delivered batches absorbed as no-ops (observability hook). */
  def replaysSkipped: Long = synchronized(skipped)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.IntegerType

/** Distributed global sequence numbering (SURVEY.md W2, A6 rank inputs).
  *
  * `row_number()` over an unpartitioned window funnels EVERY row through a
  * single task — the classic 100 TB scale-killer (and the source of
  * Spark's "No Partition Defined for Window operation" warning). The
  * scalable equivalent: sort (range-partitioned, stays distributed), then
  * number rows with `zipWithIndex`, which only needs the per-partition
  * counts (one lightweight job) and assigns `partitionOffset + localIndex`
  * in place. No data movement beyond the sort itself.
  */
object Ranks {

  /** Global 1-based row_number over `order` without a single-partition
    * window. Output column is IntegerType to match `row_number()`.
    *
    * The total order must be unique (callers pass a tiebreaker column) so
    * numbering is deterministic regardless of partition boundaries. */
  def sequenceNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    // persist the RDD before zipWithIndex: it runs TWO jobs over the
    // sorted set (partition offsets, then materialization) — without the
    // cache each job re-executes the whole upstream plan, doubling the
    // source scan. RDD persist, NOT Dataset persist: Dataset caching is
    // keyed by logical plan in the CacheManager, so a later query with
    // the same plan shape (e.g. re-listing a directory that has since
    // changed) would silently read the stale cache. Callers pass
    // capped/TakeOrdered'd sets, so the footprint is bounded; the
    // ContextCleaner reclaims it once the RDD is unreferenced.
    val sorted = df.orderBy(order: _*)
    val sortedRdd = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema.add(out, IntegerType, nullable = false)
    val numbered = sortedRdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1).toInt)
    }
    df.sparkSession.createDataFrame(numbered, schema)
  }
}

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
    val sorted = df.orderBy(order: _*)
    val schema = sorted.schema.add(out, IntegerType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1).toInt)
    }
    df.sparkSession.createDataFrame(numbered, schema)
  }
}

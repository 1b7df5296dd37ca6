package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) interleaving for
  * multi-dimension scan pruning — the public lakehouse OPTIMIZE
  * ZORDER technique (Delta/Iceberg): rows sorted or bucketed by the
  * interleaved bits of several quantized columns cluster EVERY
  * dimension's ranges into few contiguous runs, so a predicate on any
  * subset of the dimensions prunes files/row-groups, where a
  * single-column sort prunes only its own column.
  *
  * Everything is integer bit arithmetic — shiftleft/and/or — so the
  * z-value is codegen'd, parity-exact against the SQL oracle, and
  * stable across engines and runs.
  */
object LayoutOps {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1 (Morton
    * order). 2·bits ≤ 62 keeps everything in a long. */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Clamp a long column into [0, 2^bits): the quantization step
    * before interleaving (callers map their real domain onto the grid
    * first — e.g. percentile bins or fixed-width buckets). */
  def quantize(c: Column, bits: Int = 8): Column =
    least(greatest(c, lit(0L)), lit((1L << bits) - 1L))

  /** Repartition-and-sort a frame into a z-ordered layout over two
    * quantized dimensions: rows land in `buckets` z-ranges (the file/
    * row-group boundaries at scale), z-sorted within each.
    *
    * Scale: ONE range-free shuffle keyed on the z-bucket (a narrow
    * integer projection — no sampling pass like a global orderBy) plus
    * an in-partition sort; a query box over ANY of the dimensions then
    * touches the few buckets whose z-range intersects the box, which
    * is the pruning `partitionBy`/min-max stats exploit. */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
      bits: Int = 8, buckets: Int = 64): DataFrame = {
    val z = zValue(quantize(x, bits), quantize(y, bits), bits)
    val bucketBits = (math.log(buckets.toDouble) / math.log(2.0)).round.toInt
    df.withColumn("z", z)
      .withColumn("z_bucket", shiftright(col("z"), 2 * bits - bucketBits))
      .repartition(col("z_bucket"))
      .sortWithinPartitions(col("z"))
  }

  /** q143: the z-value projection over the events stream — user_id and
    * value quantized to an 8-bit grid, Morton-interleaved, bucketed to
    * 64 z-ranges. The all-integer output is the layout key a writer
    * would `partitionBy`; the LayoutOpsSpec proves the pruning claim
    * (a 2-D query box intersects FEWER z-buckets than single-column
    * buckets) on this exact frame. */
  val q143Zorder: QueryDef = QueryDef(
    "q143_zorder",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      // floor() before the long cast: Spark's double→long cast
      // truncates while DuckDB's rounds — floor is IEEE-exact in both
      val x = quantize(pmod(col("user_id"), lit(256L)).cast("long"), 8)
      val y = quantize(floor(col("value")).cast("long"), 8)
      e.select(col("event_id"), x.as("zx"), y.as("zy"))
        .withColumn("z", zValue(col("zx"), col("zy"), 8))
        .withColumn("z_bucket", shiftright(col("z"), 10))
        .orderBy(col("event_id"))
    },
    // DuckDB (PostgreSQL-style) gives ALL bitwise operators one
    // precedence level, left-associative — every term fully
    // parenthesized or the expression silently reassociates.
    Some("""SELECT event_id, zx, zy, CAST(z AS BIGINT) AS z,
        CAST(z AS BIGINT) >> 10 AS z_bucket
      FROM (SELECT event_id, zx, zy,
          ((((zx >> 0) & 1) << 0)  | (((zy >> 0) & 1) << 1)
         | (((zx >> 1) & 1) << 2)  | (((zy >> 1) & 1) << 3)
         | (((zx >> 2) & 1) << 4)  | (((zy >> 2) & 1) << 5)
         | (((zx >> 3) & 1) << 6)  | (((zy >> 3) & 1) << 7)
         | (((zx >> 4) & 1) << 8)  | (((zy >> 4) & 1) << 9)
         | (((zx >> 5) & 1) << 10) | (((zy >> 5) & 1) << 11)
         | (((zx >> 6) & 1) << 12) | (((zy >> 6) & 1) << 13)
         | (((zx >> 7) & 1) << 14) | (((zy >> 7) & 1) << 15)) AS z
        FROM (SELECT event_id,
            least(greatest(user_id % 256, 0), 255) AS zx,
            least(greatest(CAST(floor(value) AS BIGINT), 0), 255) AS zy
          FROM events) q) z
      ORDER BY event_id"""))

  val all: Seq[QueryDef] = Seq(q143Zorder)
}

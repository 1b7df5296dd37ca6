package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Proves the z-order layout claims q143's scaladoc makes:
  *   1. `zValue` is exact Morton interleaving (vs a bit-twiddling
  *      reference implementation);
  *   2. on a full 2-D grid, a query box intersects FEWER z-buckets
  *      than single-column range buckets — for predicates on either
  *      dimension — which is the file/row-group pruning a writer gets
  *      by `partitionBy(z_bucket)`;
  *   3. `zOrderLayout` preserves rows and sorts by z within each
  *      partition;
  *   4. q143 runs green on the events frame.
  */
class LayoutOpsSpec extends SparkSpec {

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue matches the reference Morton interleave") {
    val sp = spark
    import sp.implicits._
    val pairs = Seq((0L, 0L), (255L, 255L), (3L, 5L), (170L, 85L), (1L, 128L)) ++
      (0 until 50).map(i => ((i * 37L) % 256, (i * 91L) % 256))
    val df = pairs.toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(col("x"), col("y"), 8))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1), 8),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  /** Full 256x256 grid, 64 buckets per layout. Buckets touched by a
    * predicate = distinct buckets holding at least one matching row —
    * exactly what min/max file stats would let a scan skip. */
  test("a query box intersects fewer z-buckets than single-column buckets") {
    val sp = spark
    import sp.implicits._
    val grid = sp.range(256L * 256L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
      .withColumn("z", LayoutOps.zValue(col("x"), col("y"), 8))
      .withColumn("zb", shiftright(col("z"), 10))    // 64 z-buckets
      .withColumn("xb", shiftright(col("x"), 2))     // 64 x-range buckets
      .withColumn("yb", shiftright(col("y"), 2))     // 64 y-range buckets
      .cache()
    def touched(bucket: String, pred: org.apache.spark.sql.Column): Long =
      grid.filter(pred).select(bucket).distinct().count()

    val box = col("x").between(64, 79) && col("y").between(64, 79)
    // 2-D box: z-layout pins the top 3 bits of BOTH dims -> 1 bucket;
    // either single-column layout needs 4 of its own buckets.
    assert(touched("zb", box) === 1L)
    assert(touched("xb", box) === 4L)
    assert(touched("yb", box) === 4L)

    // one-dimension predicates: the single-column layout for the OTHER
    // dimension degrades to a full scan (64 buckets); z-order bounds
    // both at 8 — the sqrt-tradeoff z-ordering exists for.
    val yPred = col("y").between(64, 79)
    assert(touched("zb", yPred) === 8L)
    assert(touched("xb", yPred) === 64L)
    val xPred = col("x").between(64, 79)
    assert(touched("zb", xPred) === 8L)
    assert(touched("yb", xPred) === 64L)
    grid.unpersist()
  }

  test("zOrderLayout preserves rows and z-sorts within partitions") {
    val sp = spark
    import sp.implicits._
    val df = sp.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        col("id").as("payload"))
    val laid = LayoutOps.zOrderLayout(df, col("x"), col("y"), bits = 8, buckets = 16)
    assert(laid.count() === 4096L)
    val sortedWithin = laid.select(col("z"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("q143 runs green on events") {
    val out = LayoutOps.q143Zorder.fn(spark, sf("sf0.001")).cache()
    assert(out.count() > 0)
    // z-bucket is the top 6 of 16 z-bits -> always within [0, 64)
    val bad = out.filter(col("z_bucket") < 0 || col("z_bucket") > 63).count()
    assert(bad === 0L)
    out.unpersist()
  }
}

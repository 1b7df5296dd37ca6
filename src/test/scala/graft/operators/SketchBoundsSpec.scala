package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q77's DuckDB oracle (since round 12) pins the sketch DETERMINISM —
  * register grids and histogram cells rebuilt counter-for-counter.
  * This suite asserts the other half: the estimates are also CLOSE to
  * the exact answers, inside each algorithm's published envelope.
  *
  *  - HLL with m=256 registers: rsd = 1.04/√256 ≈ 6.5%, so ±3σ ≈ 20%
  *    is the hard bound (the linear-counting regime these counts land
  *    in is typically far tighter).
  *  - fixed-width histogram median at δ=16: the estimate is the
  *    midpoint of the bucket containing the lower-median element, so
  *    it sits within δ/2 = 8 of that element by construction.
  */
class SketchBoundsSpec extends SparkSpec {

  test("q77 sketches stay inside HLL and histogram-bucket envelopes vs exact answers") {
    val dir = sf("sf0.001")
    val approx = Relational2.q77Sketches.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

    val li = graft.Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"))
      .collect().map(r => r.getString(0) -> r).toMap
    // exact lower median per flag (the element at rank ⌈n/2⌉) — the
    // histogram bucket's midpoint must sit within δ/2 of it
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    val med = li.select(col("l_returnflag"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .filter(col("rn") === ((col("n") + 1) / 2).cast("long"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (flag, a) =>
      val parts = exact(flag).getAs[Long]("parts").toDouble
      val orders = exact(flag).getAs[Long]("orders").toDouble
      assert(math.abs(a.getAs[Double]("approx_parts") - parts) <= 0.20 * parts,
        s"$flag: approx_parts ${a.getAs[Double]("approx_parts")} vs exact $parts")
      assert(math.abs(a.getAs[Double]("approx_orders") - orders) <= 0.20 * orders,
        s"$flag: approx_orders ${a.getAs[Double]("approx_orders")} vs exact $orders")
      val m = a.getAs[Double]("approx_median_price")
      assert(math.abs(m - med(flag)) <= 8.0,
        s"$flag: approx median $m vs lower median ${med(flag)} (> δ/2 apart)")
    }
  }
}

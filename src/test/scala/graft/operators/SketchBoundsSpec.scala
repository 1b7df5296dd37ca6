package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q77 has no DuckDB oracle (sketch algorithms differ across engines) —
  * this suite gives the sketch tier its correctness signal instead:
  * every approximate answer must sit inside its algorithm's error
  * envelope around the exact answer computed in the same engine.
  *
  *  - HyperLogLog++ at rsd=0.02: relative standard deviation 2%, so
  *    ±3σ = 6% is the hard bound (typically ≪ 2% at these counts).
  *  - approx_percentile at accuracy=1000: rank error ε ≤ 1/1000. The
  *    sketch returns an actual dataset element (no interpolation), so
  *    the bound is checked against the exact 0.5 ∓ 3ε quantiles — ε for
  *    the rank guarantee plus slack for the discretization step.
  */
class SketchBoundsSpec extends SparkSpec {

  test("q77 sketches stay inside HLL and rank-error envelopes vs exact q76/q33-style answers") {
    val dir = sf("sf0.001")
    val approx = Relational2.q77Sketches.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap

    val li = graft.Tables.load(spark, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_orderkey")).as("orders"),
        expr("percentile(l_extendedprice, 0.497)").as("p_lo"),
        expr("percentile(l_extendedprice, 0.503)").as("p_hi"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (flag, a) =>
      val e = exact(flag)
      val parts = e.getAs[Long]("parts").toDouble
      val orders = e.getAs[Long]("orders").toDouble
      assert(math.abs(a.getAs[Long]("approx_parts") - parts) <= 0.06 * parts,
        s"$flag: approx_parts ${a.getAs[Long]("approx_parts")} vs exact $parts")
      assert(math.abs(a.getAs[Long]("approx_orders") - orders) <= 0.06 * orders,
        s"$flag: approx_orders ${a.getAs[Long]("approx_orders")} vs exact $orders")
      val m = a.getAs[Double]("approx_median_price")
      assert(m >= e.getAs[Double]("p_lo") && m <= e.getAs[Double]("p_hi"),
        s"$flag: approx median $m outside [${e.getAs[Double]("p_lo")}, ${e.getAs[Double]("p_hi")}]")
    }
  }
}

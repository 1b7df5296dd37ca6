package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Power-iteration invariants beyond the q202 oracle: the whole
  * 4-round trajectory re-derives bit-for-bit from the raw embeddings
  * driver-side (exact-integer arithmetic has no summation-order
  * freedom to lose), every round's vector sits on the ±1000 lattice
  * with its max-abs component AT 1000, and the gain sequence is the
  * dominant-eigenvalue estimate the scaladoc promises. */
class SpectralOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q202: trajectory re-derives exactly; lattice and gain invariants hold") {
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    val q = emb.map(_.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong))
    val n = q.length
    val dim = q.head.length
    val mean = (0 until dim).map { j =>
      math.floor(q.map(_(j)).sum.toDouble / n + 0.5).toLong
    }.toArray
    val c = q.map(v => v.zip(mean).map { case (a, b) => a - b })
    var v = Array.fill(dim)(1000L)
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    (1 to 4).foreach { r =>
      val dots = c.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      val s = (0 until dim).map { j =>
        c.zip(dots).map { case (row, d) => row(j) * d }.sum
      }.toArray
      val m = s.map(math.abs).max
      v = s.map(sj => math.floor(sj.toDouble / m.toDouble * 1000.0 + 0.5).toLong)
      (0 until dim).foreach(j => expected += ((r.toLong, (j + 1).toLong, v(j), m)))
    }
    val out = SpectralOps.q202PcaPower.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === expected.toSeq)
    // lattice: every loading in [-1000, 1000], the extreme component AT it
    (1 to 4).foreach { r =>
      val round = out.filter(_._1 == r).map(_._3)
      assert(round.forall(l => math.abs(l) <= 1000L))
      assert(round.map(math.abs).max === 1000L, s"round $r lattice peak")
    }
    // gains are positive and constant within a round
    assert(out.forall(_._4 > 0L))
    assert(out.groupBy(_._1).forall { case (_, rows) => rows.map(_._4).distinct.length == 1 })
  }
}

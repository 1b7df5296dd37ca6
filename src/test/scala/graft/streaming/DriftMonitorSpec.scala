package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DriftMonitor's exactness claims: cross-batch folded moments must
  * equal the one-shot moments bit-for-bit (int64 addition is exactly
  * associative), and the MMD² readout must replay from a driver-side
  * computation on the same lattice. */
class DriftMonitorSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def groupedEmbeddings = {
    graft.Tables.load(spark, dir, "embeddings")
      .select(concat(lit("g"), col("label") % 2).as("group"),
        col("embedding"))
  }

  test("cross-batch folded moments equal the one-shot moments bit-for-bit") {
    val all = groupedEmbeddings
      .withColumn("batch", pmod(hash(col("embedding")), lit(3)))
    val oneShot = new DriftMonitor()
    oneShot.observe(groupedEmbeddings)
    val folded = new DriftMonitor()
    (0 until 3).foreach { b =>
      folded.observe(all.filter(col("batch") === b).drop("batch"))
    }
    assert(oneShot.groups === folded.groups)
    oneShot.groups.foreach { g =>
      val (n1, s1, m1) = oneShot.moments(g).get
      val (n2, s2, m2) = folded.moments(g).get
      assert(n1 === n2, s"count drift for $g")
      assert(s1.toSeq === s2.toSeq, s"first-moment drift for $g")
      assert(m1.toSeq === m2.toSeq, s"second-moment drift for $g")
    }
  }

  test("MMD² readout replays from the quantized vectors; identical groups score zero") {
    val mon = new DriftMonitor()
    mon.observe(groupedEmbeddings)
    val Some((meanD, momD, mmd)) = mon.mmd2("g0", "g1")
    assert(meanD >= 0 && momD >= 0 && mmd === momD + 2.0 * meanD)
    // driver replay from the same ×1000 lattice
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select((col("label") % 2).cast("long").as("g"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray
        .map(x => math.floor(x * 1000.0 + 0.5).toLong)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    def mu(vs: Array[Array[Long]]) =
      (0 until 64).map(i => vs.map(_(i)).sum.toDouble / (1000.0 * vs.length))
    def mom(vs: Array[Array[Long]]) =
      (0 until 64).map(i => (0 until 64).map(j =>
        vs.map(v => v(i) * v(j)).sum.toDouble / (1e6 * vs.length)))
    val (a, b) = (vecs(0L), vecs(1L))
    val expMean = (0 until 64).map(i => math.pow(mu(a)(i) - mu(b)(i), 2)).sum
    val (oa, ob) = (mom(a), mom(b))
    val expMom = (for (i <- 0 until 64; j <- 0 until 64)
      yield math.pow(oa(i)(j) - ob(i)(j), 2)).sum
    assert(math.abs(meanD - expMean) < 1e-9, s"mean term $meanD vs $expMean")
    assert(math.abs(momD - expMom) < 1e-9, s"moment term $momD vs $expMom")
    // a group compared against itself is exactly zero drift
    val self = new DriftMonitor()
    self.observe(groupedEmbeddings.withColumn("group", lit("x")))
    self.observe(groupedEmbeddings.withColumn("group", lit("y")))
    val Some((zm, zo, zz)) = self.mmd2("x", "y")
    assert(zm === 0.0 && zo === 0.0 && zz === 0.0)
  }

  test("group-cardinality bound refuses before folding; state untouched, tracked groups still fold") {
    import spark.implicits._
    def frame(gs: String*) = gs.zipWithIndex.map { case (g, i) =>
      (g, Seq.fill(4)(0.1f * (i + 1))) }.toDF("group", "embedding")
    val m = new DriftMonitor(dim = 4, maxGroups = 2)
    m.observe(frame("a", "b"))
    val before = m.groups
    val nA = m.moments("a").get._1
    val e = intercept[IllegalStateException] { m.observe(frame("a", "c", "d")) }
    assert(e.getMessage.contains("high-cardinality"))
    // the refused batch folded NOTHING — not even its existing group's rows
    assert(m.groups === before)
    assert(m.moments("a").get._1 === nA)
    m.observe(frame("a"))
    assert(m.moments("a").get._1 === nA + 1)
  }

  test("batch-id fence: replaying the last batch is a no-op, a regressed id refuses by name") {
    import spark.implicits._
    def frame(g: String) = Seq((g, Seq.fill(4)(0.5f))).toDF("group", "embedding")
    val m = new DriftMonitor(dim = 4)
    m.observe(frame("a"), batchId = 0L)
    m.observe(frame("a"), batchId = 1L)
    val after = m.moments("a").get
    // crash-recovery replay: same id, same (or any) content — no fold
    m.observe(frame("a"), batchId = 1L)
    assert(m.moments("a").get._1 === after._1, "replayed batch double-counted")
    assert(m.moments("a").get._2.toSeq === after._2.toSeq)
    assert(m.replaysSkipped === 1L)
    // a regressed id is NOT a recovery replay — refuse, state untouched
    val e = intercept[IllegalStateException] { m.observe(frame("a"), batchId = 0L) }
    assert(e.getMessage.contains("regresses"))
    assert(m.moments("a").get._1 === after._1)
    // the stream continues past the absorbed replay
    m.observe(frame("a"), batchId = 2L)
    assert(m.moments("a").get._1 === after._1 + 1)
  }
}

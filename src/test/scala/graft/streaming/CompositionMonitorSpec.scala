package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composition monitor's cross-batch guarantee: int64 grid
  * addition is exactly associative, so any batch split yields the
  * one-shot grids bit-for-bit, and the derived q224/q229/q222 reports
  * match the oracle-checked batch queries on the same data. */
class CompositionMonitorSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("cross-batch digit grid equals one-shot; Benford report matches q224") {
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_extendedprice").as("value"))
    val m3 = new CompositionMonitor
    (0 until 3).foreach { k =>
      m3.observeAmounts(li.filter(pmod(xxhash64(col("value")), lit(3)) === k))
    }
    val m1 = new CompositionMonitor
    m1.observeAmounts(li)
    assert(m3.digitGrid == m1.digitGrid) // bit-for-bit int64 grids

    val q = graft.operators.DiagnosticsOps.q224Benford.fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    val rep = m3.benfordReport()
    q.zip(rep).foreach { case ((d, n, sh, p, t, c2, rej),
        (d2, n2, sh2, p2, t2, c22, rej2)) =>
      assert(d == d2 && n == n2 && rej == rej2)
      assert(sh == sh2 && p == p2, s"digit $d share/p")
      assert(math.abs(t - t2) < 1e-6 && math.abs(c2 - c22) < 1e-6,
        s"digit $d chi2")
    }
  }

  test("cross-batch mass grid equals one-shot; diversity and Gini match q229/q222") {
    val d = graft.Tables.load(spark, dir, "documents")
    val m3 = new CompositionMonitor
    (0 until 3).foreach { k =>
      m3.observeDocs(d.filter(pmod(col("doc_id"), lit(3)) === k))
    }
    val m1 = new CompositionMonitor
    m1.observeDocs(d)
    assert(m3.massGrid == m1.massGrid)

    val q229 = graft.operators.DiagnosticsOps.q229Diversity.fn(spark, dir)
      .collect().head
    val (n, h, e1, s2, e2, bp) = m3.diversityReport()
    assert(n == q229.getAs[Long]("n_sources"))
    assert(math.abs(h - q229.getAs[Double]("shannon_h")) < 1e-6)
    assert(math.abs(e1 - q229.getAs[Double]("eff_sources_h1")) < 1e-6)
    assert(math.abs(s2 - q229.getAs[Double]("simpson")) < 1e-6)
    assert(math.abs(e2 - q229.getAs[Double]("eff_sources_h2")) < 1e-6)
    assert(bp == q229.getAs[Double]("berger_parker"))

    val gini = graft.operators.DiagnosticsOps.q222GiniConcentration
      .fn(spark, dir).collect().head.getAs[Double]("gini")
    assert(math.abs(m3.giniReport() - gini) < 1e-6)
  }

  test("source-cardinality bound refuses before folding; state untouched, tracked sources still fold") {
    import spark.implicits._
    def frame(ss: String*) = ss.map(s => (s, "one two three")).toDF("source", "text")
    val m = new CompositionMonitor(maxSources = 2)
    m.observeDocs(frame("a", "b"))
    val before = m.massGrid
    val e = intercept[IllegalStateException] { m.observeDocs(frame("a", "c")) }
    assert(e.getMessage.contains("high-cardinality"))
    assert(m.massGrid === before)
    m.observeDocs(frame("b"))
    assert(m.massGrid("b") === before("b") + 3L)
  }

  test("batch-id fences: replay no-ops per feed, regressed ids refuse, feeds fence independently") {
    import spark.implicits._
    val docs = Seq(("a", "one two three")).toDF("source", "text")
    val amts = Seq(1.23, 4.56).toDF("value")
    val m = new CompositionMonitor()
    m.observeDocs(docs, batchId = 0L)
    m.observeAmounts(amts, batchId = 0L) // independent feed, same id: folds
    val mass = m.massGrid
    val grid = m.digitGrid
    // recovery replay of the last committed batch on each feed: no-op
    m.observeDocs(docs, batchId = 0L)
    m.observeAmounts(amts, batchId = 0L)
    assert(m.massGrid === mass, "replayed doc batch double-counted")
    assert(m.digitGrid === grid, "replayed amount batch double-counted")
    assert(m.replaysSkipped === 2L)
    // regressed id refuses by name, state untouched
    m.observeDocs(docs, batchId = 3L)
    val e = intercept[IllegalStateException] { m.observeDocs(docs, batchId = 1L) }
    assert(e.getMessage.contains("regresses"))
    assert(m.massGrid("a") === 2 * mass("a"))
  }
}

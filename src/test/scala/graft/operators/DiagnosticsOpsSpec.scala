package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DiagnosticsOpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  test("q142 skew audit: ranks dense, counts non-increasing, shares consistent") {
    val rows = DiagnosticsOps.q142SkewAudit.fn(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rank") === i + 1L, "ranks must be dense from 1")
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "counts must not increase")
    val shares = rows.map(_.getAs[Double]("share"))
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.forall(s => s > 0.0 && s <= 1.0))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cum_share must be monotone")
    assert(cums.last <= 1.0 + 1e-9)
    // counts agree with an independent aggregate
    val expect = graft.Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === expect(r.getAs[Long]("user_id")))
    }
  }

  test("q152 snapshot diff: statuses partition the id space by their mod classes") {
    val rows = DiagnosticsOps.q152SnapshotDiff.fn(spark, dir).collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    // independent recomputation from the mod-class definitions
    val ids = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val added = ids.count { case (id, _) => id % 10 == 9 && id % 13 != 5 }
    val removed = ids.count { case (id, _) => id % 13 == 5 && id % 10 != 9 }
    // an edit only registers as changed if the truncation actually
    // shortened the text (greatest(1, n div 2) < n)
    val changed = ids.count { case (id, n) =>
      id % 7 == 3 && id % 10 != 9 && id % 13 != 5 && math.max(1L, n / 2) < n }
    assert(byStatus("added") === added.toLong)
    assert(byStatus("removed") === removed.toLong)
    assert(byStatus("changed") === changed.toLong)
    val both = ids.count { case (id, _) => id % 10 != 9 && id % 13 != 5 }
    assert(byStatus("unchanged") === (both - changed).toLong)
    // every (source, status) count is positive and statuses are closed
    assert(rows.forall(_.getAs[Long]("n") > 0))
    assert(byStatus.keySet.subsetOf(Set("added", "removed", "changed", "unchanged")))
  }

  test("skewAudit flags a constructed hot key at rank 1 with the right share") {
    val df = (Seq.fill(80)("hot") ++ (1 to 20).map(i => s"k$i")).toDF("k")
    val audit = DiagnosticsOps.skewAudit(df, col("k"), topN = 5).collect()
    assert(audit.head.getAs[String]("key") === "hot")
    assert(audit.head.getAs[Double]("share") === 0.8)
    assert(audit.length === 5)
  }

  test("q195: chunk reuse is bounded by the half-prefix and covers q191's doc set") {
    val dir = "/root/testdata/sf0.01"
    val rows = DiagnosticsOps.q195ChunkDelta.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, reused, frac) = (r.getLong(1), r.getLong(3), r.getDouble(4))
      assert(reused >= 0L && reused <= n)
      // prev is the doc's FIRST HALF: at most ~half the current tokens
      // can sit in chunks that existed before (half + one boundary
      // chunk of slack)
      assert(frac <= 0.5 + 16.0 / n.max(1L),
        s"doc ${r.getLong(0)} reuse $frac exceeds the half-prefix bound")
    }
    // same changed-doc universe as the q191 magnitude audit
    val q191Ids = DiagnosticsOps.q191ChangeMagnitude.fn(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet === q191Ids)
    // CDC must achieve nonzero reuse somewhere (the audit's point)
    assert(rows.map(_.getDouble(4)).max > 0.2,
      "no doc reuses chunks — CDC boundary resync is broken")
  }

  test("q222: Lorenz curve is convex-monotone to (1,1); Gini replays and bounds hold") {
    val rows = DiagnosticsOps.q222GiniConcentration.fn(spark, dir).collect()
    assert(rows.length === 20)
    val gini = rows.head.getDouble(5)
    assert(rows.map(_.getDouble(5)).distinct.length === 1)
    assert(gini >= 0.0 && gini < 1.0)
    // monotone Lorenz curve ending at (1, 1), always under the diagonal
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getDouble(4) >= a.getDouble(4) - 1e-12)
      // ascending-order cumulation ⇒ mass share can't exceed pop share
      assert(a.getDouble(4) <= a.getDouble(3) + 1e-9)
    }
    assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9)
    // driver replay of the exact discrete formula
    val ws = rows.sortBy(_.getLong(1)).map(_.getLong(2))
    val k = ws.length
    val tot = ws.sum.toDouble
    val iw = ws.zipWithIndex.map { case (w, i) => (i + 1).toLong * w }.sum
    val expect = 2.0 * iw / (k * tot) - (k + 1).toDouble / k
    assert(math.abs(gini - expect) < 1e-6)
    // Gini of the 20 near-equal synthetic sources must be small
    assert(gini < 0.2, s"synthetic balanced corpus shows gini $gini")
  }

  test("q223: median/MAD and the outlier count replay from driver-side sorting") {
    val rows = DiagnosticsOps.q223HampelOutliers.fn(spark, dir).collect()
    assert(rows.length === 20)
    val lens = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
      .map { case (s, t) => (s, t.trim.toLowerCase.split("\\s+").length.toLong) }
      .groupBy(_._1)
    def lowerMedian(xs: Array[Long]): Long = {
      val s = xs.sorted
      s((xs.length + 1) / 2 - 1)
    }
    rows.foreach { r =>
      val xs = lens(r.getString(0)).map(_._2)
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      assert(r.getLong(1) === xs.length.toLong)
      assert(r.getLong(2) === med, s"median drift for ${r.getString(0)}")
      assert(r.getLong(3) === mad, s"MAD drift for ${r.getString(0)}")
      val out = xs.count(x => math.abs(x - med).toDouble > 3.0 * 1.4826 * mad)
      assert(r.getLong(4) === out.toLong, s"outlier count for ${r.getString(0)}")
    }
    // a planted extreme outlier is flagged, the bulk is not
    val planted = Array.fill(99)(100L) :+ 10000L
    val med = lowerMedian(planted)
    val mad = lowerMedian(planted.map(x => math.abs(x - med)))
    // MAD of a constant-bulk sample is 0 — the known Hampel degeneracy:
    // everything off-median flags; with 1 varying value that's exactly 1
    assert(planted.count(x =>
      math.abs(x - med).toDouble > 3.0 * 1.4826 * mad) === 1)
  }
}

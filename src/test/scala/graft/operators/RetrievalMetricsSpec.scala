package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q161's ranked metrics pinned against a driver-side recomputation
  * from raw embeddings — recall@10, MRR, and nDCG@10 re-derived with
  * plain Scala over the same rounded-cosine ranking. */
class RetrievalMetricsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q161: metrics in range and equal to a driver-side recomputation") {
    val rows = RetrievalOps.q161RetrievalMetrics.fn(spark, dir).collect()
    assert(rows.length === 10, "10 query rows expected")
    rows.foreach { r =>
      Seq("recall_at_10", "mrr", "ndcg_at_10").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0 + 1e-9, s"$c out of range: $v")
      }
      assert(r.getAs[Long]("hits") <= 10L)
    }
    // driver-side reference
    val all = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var s = 0.0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val labelCounts = all.groupBy(_._2).view.mapValues(_.length).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val (_, qlabel, qv) = all.find(_._1 == qid).get
      val ranked = all.filter(_._1 != qid)
        .map { case (id, lb, v) => (id, lb, dot(v, qv)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(10)
      val rels = ranked.zipWithIndex.map { case ((_, lb, _), i) =>
        (i + 1, lb == qlabel)
      }
      val nGold = labelCounts(qlabel) - 1
      val hits = rels.count(_._2)
      val recall = hits.toDouble / math.min(10, nGold)
      val mrr = rels.find(_._2).map { case (rk, _) => 1.0 / rk }.getOrElse(0.0)
      val dcg = rels.collect { case (rk, true) => 1.0 / (math.log(rk + 1) / math.log(2)) }.sum
      val idcg = (1 to math.min(10, nGold))
        .map(i => 1.0 / (math.log(i + 1) / math.log(2))).sum
      assert(r.getAs[Long]("hits") === hits.toLong, s"hits drift qid=$qid")
      assert(math.abs(r.getAs[Double]("recall_at_10") - recall) < 1e-6, s"recall qid=$qid")
      assert(math.abs(r.getAs[Double]("mrr") - mrr) < 1e-6, s"mrr qid=$qid")
      assert(math.abs(r.getAs[Double]("ndcg_at_10") - dcg / idcg) < 1e-6, s"ndcg qid=$qid")
    }
  }
}

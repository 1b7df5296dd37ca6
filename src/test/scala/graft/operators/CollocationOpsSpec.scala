package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Novelty/PMI invariants beyond the oracles: both outputs are
  * re-derived independently driver-side from the raw documents, and
  * the structural identities (first doc is all-novel; novel counts sum
  * to the distinct-gram count; PMI rows respect the support floor and
  * the rank order) are pinned. */
class CollocationOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docTexts: Seq[(Long, String)] =
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("q200: novelty re-derives from raw text and sums to the gram vocabulary") {
    val gramsByDoc: Map[Long, Set[String]] = docTexts.map { case (id, text) =>
      val t = text.trim
      val w = t.split("\\s+")
      val sh =
        if (w.length >= 5)
          (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
        else Set(t)
      id -> sh
    }.toMap
    val firstSeen = gramsByDoc.toSeq
      .flatMap { case (id, sh) => sh.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val out = CollocationOps.q200NoveltyProfile.fn(spark, dir).collect()
    assert(out.length === gramsByDoc.size)
    out.foreach { r =>
      val (id, nGrams, nNovel) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nGrams === gramsByDoc(id).size.toLong, s"doc $id gram count")
      assert(nNovel === firstSeen.count(_._2 == id).toLong, s"doc $id novel count")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // identities: the earliest doc is all-novel; novel counts partition
    // the gram vocabulary
    val minDoc = gramsByDoc.keys.min
    assert(out.find(_.getLong(0) == minDoc).get.getDouble(3) === 1.0,
      "first-ingested doc must be 100% novel")
    assert(out.map(_.getLong(2)).sum === firstSeen.size.toLong,
      "novel counts must sum to the distinct-gram vocabulary size")
  }

  test("q201: PMI rows re-derive from raw counts and ranks are honest") {
    val toks = docTexts.map { case (_, t) => t.trim.toLowerCase.split("\\s+").toSeq }
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bg = toks.filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val nTok = toks.map(_.size).sum.toDouble
    val nBg = toks.map(w => math.max(w.length - 1, 0)).sum.toDouble
    def lift(cab: Long, ca: Long, cb: Long): Double = {
      val raw = (cab.toDouble / nBg) / (ca.toDouble / nTok) / (cb.toDouble / nTok)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = bg.toSeq.filter(_._2 >= 5)
      .map { case ((a, b), cab) => (a, b, cab, uni(a), uni(b), lift(cab, uni(a), uni(b))) }
      .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }
      .take(20)
    val out = CollocationOps.q201PmiCollocations.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === expected)
    assert(out.forall(_._3 >= 5), "support floor")
    assert(out.map(_._6).toSeq === out.map(_._6).sortBy(-_).toSeq, "rank order")
  }

  test("q206: one textRankRound matches hand math on a weighted path") {
    import spark.implicits._
    // path a-b-c, unit weights; ow: a=1, b=2, c=1; from 1.0:
    //   a = 0.15 + 0.85·(1·1/2)     = 0.575
    //   b = 0.15 + 0.85·(1/1 + 1/1) = 1.85
    //   c = 0.575
    val und = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("a", "b", "w")
    val edges = und.select($"a".as("u"), $"b".as("v"), $"w")
      .unionByName(und.select($"b".as("u"), $"a".as("v"), $"w"))
    val outw = edges.groupBy("u").agg(sum($"w").as("ow"))
    val nodes = edges.select($"u".as("tok")).distinct()
    val scores = nodes.withColumn("score", lit(1.0))
    val r1 = CollocationOps.textRankRound(nodes, edges, outw, scores)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(r1("a") - 0.575) < 1e-12)
    assert(math.abs(r1("b") - 1.85) < 1e-12)
    assert(math.abs(r1("c") - 0.575) < 1e-12)
  }

  test("q206: TextRank re-derives from a driver-side replay of the full iteration") {
    // independent plain-Scala implementation of graph build + 6 rounds
    val toks = docTexts.map { case (_, t) => t.trim.toLowerCase.split("\\s+").toSeq }
    val und = toks.filter(_.length >= 2)
      .flatMap(w => w.zip(w.tail))
      .filter { case (x, y) => x != y }
      .map { case (x, y) => if (x < y) (x, y) else (y, x) }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 5)
    val nbrs = und.toSeq
      .flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(x => (x._2, x._3)) }
    val ow = nbrs.map { case (u, xs) => u -> xs.map(_._2).sum.toDouble }
    var sc: Map[String, Double] = nbrs.keys.map(_ -> 1.0).toMap
    (1 to 6).foreach { _ =>
      sc = nbrs.map { case (v, _) =>
        val in = nbrs(v).map { case (u, w) => sc(u) * w / ow(u) }.sum
        v -> ((1 - 0.85) + 0.85 * in)
      }
    }
    val expectTop = sc.toSeq
      .map { case (t, s) =>
        (t, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (t, s) => (-s, t) }.take(20)
    val out = CollocationOps.q206Textrank.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(out.length === math.min(20, sc.size))
    out.zip(expectTop).foreach { case ((tok, s), (etok, es)) =>
      assert(tok === etok, "keyword rank order must match the replay")
      // driver replay sums in a different order than the shuffle —
      // agreement must hold to well under the rounding granularity
      assert(math.abs(s - es) <= 2e-6, s"$tok: $s vs $es")
    }
    assert(out.forall(_._2 >= 0.15 - 1e-9), "(1 - d) is the score floor")
  }
}

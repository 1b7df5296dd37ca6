package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NB quality classifier semantics, pinned independently of the q170
  * oracle: the closed-form log-odds separate the classes on a corpus
  * where they differ, and the score is the length-normalized mean (so
  * duplicating a document's text leaves its score unchanged). */
class ClassifierOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("seed sources score higher on average than the rest") {
    val out = ClassifierOps.q170NbQuality.fn(spark, dir)
      .join(graft.Tables.loadParallel(spark, dir, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("seed", col("source").isin("src0", "src1", "src2"))
      .groupBy(col("seed")).agg(avg(col("quality_lr")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // The classifier is trained to separate exactly this labeling, so
    // in-sample the seed mean must exceed the non-seed mean.
    assert(out(true) > out(false),
      s"seed mean ${out(true)} must exceed non-seed mean ${out(false)}")
  }

  test("keep flag is exactly quality_lr > 0") {
    val bad = ClassifierOps.q170NbQuality.fn(spark, dir)
      .filter(col("keep") =!= (col("quality_lr") > 0.0)).count()
    assert(bad === 0L)
  }

  test("score is per-token normalized: self-concatenated text scores identically") {
    import spark.implicits._
    // Build a tiny corpus by hand through the same arithmetic: a doc
    // and its doubled twin must get the same mean log-odds.
    val toks = Seq(
      (1L, true, "alpha beta"), (2L, false, "gamma delta"),
      (3L, false, "alpha beta alpha beta"))
      .toDF("doc_id", "pos", "text")
      .select(col("doc_id"), col("pos"),
        explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val tot = counts.agg(sum(col("cpos")).as("npos"),
      sum(col("cneg")).as("nneg"), count(lit(1)).as("v"))
    val w = counts.crossJoin(broadcast(tot)).select(col("tok"),
      (log((col("cpos") + lit(1.0)) / (col("npos") + col("v")).cast("double")) -
        log((col("cneg") + lit(1.0)) / (col("nneg") + col("v")).cast("double"))).as("w"))
    val scores = toks.join(broadcast(w), Seq("tok"))
      .groupBy(col("doc_id")).agg(round(avg(col("w")), 6).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) === scores(3L),
      "doubling the text must not change the mean log-odds")
  }

  test("q177: keep rule matches the published inequality; high scorers survive more") {
    val rows = ClassifierOps.q177ParetoResample.fn(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    // flag consistency with the reported (rounded) columns: a kept doc
    // can't have draw clearly below 1 - score, and vice versa
    rows.foreach { r =>
      val (sc, dr, kept) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(dr > 0.0, "a Pareto draw is strictly positive")
      if (dr - (1.0 - sc) > 1e-5) assert(kept, s"doc ${r.getLong(0)}")
      if ((1.0 - sc) - dr > 1e-5) assert(!kept, s"doc ${r.getLong(0)}")
    }
    // GPT-3's intent: the top score quartile survives at a higher rate
    // than the bottom quartile (the heavy tail keeps SOME low scorers)
    val sorted = rows.sortBy(_.getDouble(1))
    val q = rows.length / 4
    val lowRate = sorted.take(q).count(_.getBoolean(3)).toDouble / q
    val highRate = sorted.takeRight(q).count(_.getBoolean(3)).toDouble / q
    assert(highRate > lowRate,
      s"high-score keep rate $highRate must exceed low-score rate $lowRate")
  }

  test("q207: the GD trajectory re-derives exactly from a driver-side integer replay") {
    // independent plain-Scala replay of feature quantization + 8 rounds
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
    val feats = docs.map { case (_, text) =>
      val tk = text.trim.split("\\s+")
      val nTok = tk.length.toLong
      val nt = nTok.toDouble
      val x1 = math.floor(math.min(nTok, 400L).toDouble / 400.0 * 100.0 + 0.5).toLong
      val x2 = math.floor(tk.distinct.length.toDouble / nt * 100.0 + 0.5).toLong
      val x3 = math.floor(tk.count(w => w == "the" || w == "a").toDouble / nt * 100.0 + 0.5).toLong
      val x4 = math.floor(math.min(text.replace(" ", "").length.toDouble / nt, 10.0) * 10.0 + 0.5).toLong
      val y = if (nTok >= 50 && x3 >= 5) 1L else 0L
      (Array(100L, x1, x2, x3, x4), y)
    }
    assert(feats.map(_._2).distinct.length == 2,
      "the gate label must be non-degenerate at sf0.001 for the probe to mean anything")
    var w = Array(0L, 0L, 0L, 0L, 0L)
    val n = feats.length
    val expect = (1 to 8).map { t =>
      val g = Array.fill(5)(0L)
      feats.foreach { case (x, y) =>
        val m = (0 to 4).map(j => w(j) * x(j)).sum
        val r = m - y * 10000000L
        (0 to 4).foreach(j => g(j) += r * x(j))
      }
      w = w.zip(g).map { case (a, gj) =>
        a - math.floor(gj / (20000.0 * n) + 0.5).toLong
      }
      (t, w(0) / 100000.0, w(1) / 100000.0, w(2) / 100000.0,
        w(3) / 100000.0, w(4) / 100000.0)
    }
    val out = ClassifierOps.q207LinearProbe.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === expect, "integer-lattice GD must replay EXACTLY")
  }

  test("q207: gradients are partition-count independent (int64 sums are order-free)") {
    val feat = ClassifierOps.probeFeatures(
      graft.Tables.loadParallel(spark, dir, "documents"))
    val w = Array(12345L, -678L, 910L, -1112L, 1314L)
    def grads(parts: Int): Seq[Long] = {
      val m = (0 to 4).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)
      feat.repartition(parts)
        .withColumn("r", m - col("y") * lit(10000000L))
        .agg(sum(col("r") * col("x0")), sum(col("r") * col("x1")),
          sum(col("r") * col("x2")), sum(col("r") * col("x3")),
          sum(col("r") * col("x4")))
        .head().toSeq.map(_.asInstanceOf[Long])
    }
    assert(grads(1) === grads(7),
      "a float-typed gradient would drift with partitioning; the lattice must not")
  }

  test("q212: χ² replays exactly from driver-side contingency tables") {
    val out = ClassifierOps.q212Chi2Tokens.fn(spark, dir).collect()
    assert(out.length === 30)
    // descending χ² with token tiebreak
    out.sliding(2).foreach { case Array(p, q) =>
      assert(p.getDouble(5) > q.getDouble(5) ||
        (p.getDouble(5) == q.getDouble(5) && p.getString(0) < q.getString(0)))
    }
    // driver replay of the statistic
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1)).filter(_.trim.nonEmpty)
    val labeled = docs.map { t =>
      val tk = t.trim.toLowerCase.split("\\s+")
      val stop = tk.count(w => w == "the" || w == "a").toDouble
      val y = tk.length >= 50 && stop / tk.length >= 0.05
      (y, tk.toSet)
    }
    val n1 = labeled.count(_._1).toLong
    val n0 = labeled.length - n1
    out.foreach { r =>
      val t = r.getString(0)
      val a = labeled.count(l => l._1 && l._2(t)).toLong
      val b = labeled.count(l => !l._1 && l._2(t)).toLong
      assert(r.getLong(1) === a && r.getLong(2) === b, s"cells drift for '$t'")
      val (c, d) = (n1 - a, n0 - b)
      val e = a.toDouble * d.toDouble - c.toDouble * b.toDouble
      val chi2 = (n1 + n0).toDouble * (e * e) /
        ((a + b).toDouble * (c + d).toDouble *
          (a + c).toDouble * (b + d).toDouble)
      assert(r.getDouble(5) === chi2, s"chi2 drift for '$t'")
      assert(chi2 >= 0.0 && chi2 <= (n1 + n0).toDouble + 1e-9)
    }
  }

  test("q214: AUC matches brute-force pair counting and the scorer separates its classes") {
    val r = ClassifierOps.q214AucAudit.fn(spark, dir).head()
    val (auc, ap) = (r.getDouble(3), r.getDouble(4))
    assert(auc >= 0.0 && auc <= 1.0 && ap >= 0.0 && ap <= 1.0)
    assert(auc > 0.5, "the NB scorer must separate its own seed classes")
    // brute-force AUC over all pos-neg score pairs
    val docs = graft.Tables.load(spark, dir, "documents")
    val scored = ClassifierOps
      .nbQualityOf(docs, Seq("src0", "src1", "src2"))
      .join(docs.select(col("doc_id"),
        col("source").isin("src0", "src1", "src2").as("pos")), "doc_id")
      .select(col("quality_lr"), col("pos")).collect()
      .map(x => (x.getDouble(0), x.getBoolean(1)))
    val ps = scored.filter(_._2).map(_._1)
    val ns = scored.filterNot(_._2).map(_._1)
    assert(r.getLong(0) === ps.length.toLong && r.getLong(1) === ns.length.toLong)
    var s = 0.0
    for (p <- ps; n <- ns)
      s += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val brute = s / (ps.length.toDouble * ns.length)
    assert(math.abs(auc - brute) < 1e-6, s"grouped AUC $auc vs brute $brute")
  }

  test("q215: reliability bins partition the corpus; ECE is the weighted gap") {
    val rows = ClassifierOps.q215CalibrationEce.fn(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val nDocs = graft.Tables.load(spark, dir, "documents")
      .filter(length(trim(col("text"))) > 0).count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "bins must cover every scored doc")
    rows.foreach { r =>
      val (bin, conf, acc) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(bin >= 0 && bin <= 9)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9 ||
        bin == 9, s"bin $bin mean confidence $conf outside its bin")
      assert(acc >= 0.0 && acc <= 1.0)
    }
    val ece = rows.head.getDouble(4)
    val expect = rows.map(r => r.getLong(1).toDouble *
      math.abs(r.getDouble(3) - r.getDouble(2))).sum / rows.map(_.getLong(1)).sum
    assert(math.abs(ece - expect) < 1e-6)
    assert(rows.map(_.getDouble(4)).distinct.length === 1,
      "ECE column is a single broadcast value")
  }

  test("q220: KS D replays from driver-side empirical CDFs") {
    val r = ClassifierOps.q220KsTest.fn(spark, dir).head()
    val docs = graft.Tables.load(spark, dir, "documents")
    val scored = ClassifierOps
      .nbQualityOf(docs, Seq("src0", "src1", "src2"))
      .join(docs.select(col("doc_id"),
        col("source").isin("src0", "src1", "src2").as("pos")), "doc_id")
      .select(col("quality_lr"), col("pos")).collect()
      .map(x => (x.getDouble(0), x.getBoolean(1)))
    val ps = scored.filter(_._2).map(_._1).sorted
    val ns = scored.filterNot(_._2).map(_._1).sorted
    assert(r.getLong(0) === ps.length.toLong && r.getLong(1) === ns.length.toLong)
    val gridPoints = (ps ++ ns).distinct.sorted
    def cdf(xs: Array[Double], s: Double): Double =
      xs.count(_ <= s).toDouble / xs.length
    val (dMax, sStar) = gridPoints
      .map(s => (math.abs(cdf(ps, s) - cdf(ns, s)), s))
      .maxBy { case (d, s) => (d, -s) }
    assert(math.abs(r.getDouble(3) - dMax) < 1e-6,
      s"D ${r.getDouble(3)} vs replay $dMax")
    assert(r.getDouble(2) === sStar, "argmax score drift")
    val t = dMax / math.sqrt((ps.length + ns.length).toDouble /
      (ps.length.toDouble * ns.length))
    assert(math.abs(r.getDouble(4) - t) < 1e-6)
    assert(r.getBoolean(5) === (t > 1.358))
    // the NB scorer plainly separates its own classes at sf0.001
    assert(r.getBoolean(5), "seed vs crawl distributions must differ")
  }
}

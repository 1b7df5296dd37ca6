package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** Constructed-corpus pins for the round-12 statistics tier (q224,
  * q225, q226, q227, q228, q229, q230): each query's formula is
  * replayed by hand on inputs small enough to verify on paper, so the
  * DuckDB oracle (which shares the formula text) is not the only
  * evidence. */
class CorpusStatsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stats").toString
    rows.map { case (id, text, lang, src) =>
      (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q224: first digits come from the integer cent string; chi2 matches the hand formula") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-benford").toString
    // cents: 123→1, 1999→1, 250→2, 96→9, 3410→3, 911→9
    val prices = Seq(1.23, 19.99, 2.50, 0.96, 34.10, 9.11)
    prices.map(p => (1L, p)).toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = DiagnosticsOps.q224Benford.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet == (1 to 9).toSet) // zero-count digits kept
    assert(out(1).getLong(1) == 2L && out(9).getLong(1) == 2L &&
      out(2).getLong(1) == 1L && out(3).getLong(1) == 1L &&
      out(4).getLong(1) == 0L)
    // hand chi2 over ALL 9 Benford cells (zeros contribute E_d)
    val n = Map(1 -> 2.0, 2 -> 1.0, 3 -> 1.0, 9 -> 2.0).withDefaultValue(0.0)
    val chi2 = (1 to 9).map { d =>
      val e = math.log10(1.0 + 1.0 / d) * prices.length
      (n(d) - e) * (n(d) - e) / e
    }.sum
    assert(math.abs(out(1).getDouble(5) - chi2) < 1e-4)
  }

  test("q225: burstiness tf/df and the Fisher dispersion match hand values") {
    val dir = writeDocs(Seq(
      (0L, "a a a a", "en", "s0"),
      (1L, "a b", "en", "s0"),
      (2L, "b", "en", "s0")))
    val out = TextAnalysis.q225Burstiness.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // a: tf=5 over docs (4,1,0); mean 5/3; var 26/9; vmr 26/15
    assert(out("a").getLong(1) == 5L && out("a").getLong(2) == 2L)
    assert(out("a").getDouble(3) == 2.5)
    assert(math.abs(out("a").getDouble(4) - 26.0 / 15.0) < 1e-6)
    // b: tf=2 over docs (0,1,1); mean 2/3; var 2/9; vmr 1/3
    assert(out("b").getDouble(3) == 1.0)
    assert(math.abs(out("b").getDouble(4) - 1.0 / 3.0) < 1e-6)
  }

  test("q226: identical sources estimate Jaccard 1; disjoint sources estimate ~0") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val dir = writeDocs(Seq(
      (0L, text, "en", "sA"),
      (1L, text, "en", "sB"), // sB = exact copy of sA's shingle set
      (2L, "completely different vocabulary with no shared shingles here at all",
        "en", "sC")))
    val out = DedupOps.q226SourceMinhash.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("sA", "sB"))
    assert(ab.getDouble(2) == 1.0 && ab.getDouble(3) == 1.0 &&
      ab.getDouble(4) == 0.0) // est, exact, err
    val ac = out(("sA", "sC"))
    assert(ac.getDouble(3) == 0.0) // exact Jaccard 0
    assert(ac.getDouble(2) < 0.5)  // minima of disjoint sha sets differ
  }

  test("q227: identical halves give the truncated-prefix RBO of the shared 3-token ranking") {
    // doc 0 (even half) and doc 1 (odd half) carry the same tokens →
    // both halves rank x,y,z identically; A_d = min(d, 3)
    val dir = writeDocs(Seq(
      (0L, "x y z", "en", "s0"),
      (1L, "x y z", "en", "s0")))
    val r = DiagnosticsOps.q227RankChurn.fn(spark, dir).collect().head
    assert(r.getAs[Long]("overlap_at_depth") == 3L)
    var exp = 0.0
    (1 to 100).foreach(d => exp += math.pow(0.9, d - 1) * math.min(d, 3).toDouble / d)
    exp *= 0.1
    assert(math.abs(r.getAs[Double]("rbo") - exp) < 1e-6)
  }

  test("q228: a deterministic alternating process has zero conditional entropy and MI = ln 2") {
    val dir = writeDocs(Seq((0L, "a b a b a", "en", "s0")))
    val r = LmOps.q228ConditionalEntropy.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_bigrams") == 4L)
    assert(r.getAs[Double]("h_cond") == 0.0)
    assert(r.getAs[Double]("ppl") == 1.0)
    assert(math.abs(r.getAs[Double]("h_unigram") - math.log(2.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("mutual_info") - math.log(2.0)) < 1e-6)
  }

  test("q229: 3:1 two-source split gives the textbook H, Simpson, Berger-Parker") {
    val dir = writeDocs(Seq(
      (0L, "w w w", "en", "sA"),
      (1L, "w", "en", "sB")))
    val r = DiagnosticsOps.q229Diversity.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_sources") == 2L)
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(r.getAs[Double]("shannon_h") - h) < 1e-6)
    assert(r.getAs[Double]("simpson") == 0.625)
    assert(r.getAs[Double]("eff_sources_h2") == 1.6)
    assert(r.getAs[Double]("berger_parker") == 0.75)
  }

  test("q231: hand-sized grids give the textbook tau-b, with tie correction") {
    // perfectly monotone, no ties → τ_b = 1
    val d1 = writeDocs(Seq(
      (0L, "a", "en", "s0"),
      (1L, "a b", "en", "s0"),
      (2L, "a b c", "en", "s0")))
    val r1 = DiagnosticsOps.q231KendallTau.fn(spark, d1).collect().head
    assert(r1.getAs[Long]("concordant") == 3L &&
      r1.getAs[Long]("discordant") == 0L)
    assert(r1.getAs[Double]("tau_b") == 1.0)
    // one tied pair on each margin: C=1, D=0, t_x=t_y=1, n0=3 →
    // τ_b = 1/√((3−1)(3−1)) = 0.5
    val d2 = writeDocs(Seq(
      (0L, "a a", "en", "s0"),  // (x=2, y=1)
      (1L, "b", "en", "s0"),    // (1, 1)
      (2L, "c d", "en", "s0"))) // (2, 2)
    val r2 = DiagnosticsOps.q231KendallTau.fn(spark, d2).collect().head
    assert(r2.getAs[Long]("concordant") == 1L &&
      r2.getAs[Long]("discordant") == 0L)
    assert(r2.getAs[Long]("tie_x") == 1L && r2.getAs[Long]("tie_y") == 1L)
    assert(r2.getAs[Double]("tau_b") == 0.5)
  }

  test("q232: fully-separated samples give the textbook U and z; identical samples give z=0") {
    // src0 lengths {1,2,3}, src1 {4,5,6}: R_A=6 → U=0, no ties →
    // z = (0 − 4.5 + 0.5)/√(9/12·7) = −4/√5.25
    val d1 = writeDocs(Seq(
      (0L, "a", "en", "src0"), (1L, "a b", "en", "src0"),
      (2L, "a b c", "en", "src0"),
      (3L, "a b c d", "en", "src1"), (4L, "a b c d e", "en", "src1"),
      (5L, "a b c d e f", "en", "src1")))
    val r1 = DiagnosticsOps.q232MannWhitney.fn(spark, d1).collect().head
    assert(r1.getAs[Long]("na") == 3L && r1.getAs[Long]("nb") == 3L)
    assert(r1.getAs[Double]("u") == 0.0)
    val zExp = BigDecimal(-4.0 / math.sqrt(5.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("z") == zExp)
    // identical singleton samples: U = mean → z = 0, not rejected
    val d2 = writeDocs(Seq(
      (0L, "a b", "en", "src0"), (1L, "a b", "en", "src1")))
    val r2 = DiagnosticsOps.q232MannWhitney.fn(spark, d2).collect().head
    assert(r2.getAs[Double]("z") == 0.0 && !r2.getAs[Boolean]("rejected"))
  }

  test("q233: perfect association gives V=1; independence gives V=0") {
    val d1 = writeDocs(Seq(
      (0L, "t", "en", "sA"), (1L, "t", "en", "sA"),
      (2L, "t", "de", "sB"), (3L, "t", "de", "sB")))
    val r1 = DiagnosticsOps.q233CramersV.fn(spark, d1).collect().head
    assert(r1.getAs[Double]("chi2") == 4.0)
    assert(r1.getAs[Double]("cramers_v") == 1.0)
    val d2 = writeDocs(Seq(
      (0L, "t", "en", "sA"), (1L, "t", "de", "sA"),
      (2L, "t", "en", "sB"), (3L, "t", "de", "sB")))
    val r2 = DiagnosticsOps.q233CramersV.fn(spark, d2).collect().head
    assert(r2.getAs[Double]("chi2") == 0.0)
    assert(r2.getAs[Double]("cramers_v") == 0.0)
  }

  test("q234: identical parity halves give PSI 0, verdict stable") {
    val dir = writeDocs(Seq(
      (0L, "a", "en", "s0"), (1L, "a", "en", "s0"),       // len 1 each half
      (2L, "a b", "en", "s0"), (3L, "a b", "en", "s0"),   // len 2 each half
      (4L, "a b c", "en", "s0"), (5L, "a b c", "en", "s0")))
    val r = DiagnosticsOps.q234Psi.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_ref") == 3L && r.getAs[Long]("n_cur") == 3L)
    assert(r.getAs[Double]("psi") == 0.0)
    assert(r.getAs[String]("verdict") == "stable")
  }

  test("q230: union-by-max equals the union's own sketch; identical sources double-count") {
    val text = "one two three four five six seven eight nine ten"
    val dir = writeDocs(Seq(
      (0L, text, "en", "sA"),
      (1L, text, "en", "sB")))
    val r = Relational2.q230HllUnion.fn(spark, dir).collect().head
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("exact_union") == 10L)
    // identical register grids: sum = 2×union exactly → dup_factor 2
    assert(r.getAs[Double]("dup_factor") == 2.0)
    // small-cardinality linear-counting regime: estimate near truth
    assert(math.abs(r.getAs[Double]("union_est") - 10.0) < 2.0)
  }
}

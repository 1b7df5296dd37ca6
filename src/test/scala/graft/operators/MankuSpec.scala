package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Manku permuted-table rung (q244): 64-bit fingerprints, 6
  * blocks, C(6,3) = 20 tables — any pair within Hamming distance 3
  * leaves ≥ 3 blocks untouched, so some table keys on an untouched
  * triple and the banded join recalls the pair. The spec proves
  * banded = brute on the real corpus AND on an adversarial signature
  * set constructed to sit exactly at the distance bound. */
class MankuSpec extends SparkSpec {

  test("banded q244 pairs equal brute-force exact Hamming <= 3 on the real corpus") {
    val dir = sf("sf0.001")
    val sig = DedupOps.packedSimhash(spark, dir)
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig_hi ^ b.sig_hi) + bit_count(a.sig_lo ^ b.sig_lo)")
          .cast("long").as("hamming"))
      .filter(col("hamming") <= DedupOps.MankuHamMax)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = DedupOps.q244MankuPairs.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute,
      s"banded=${banded.size} brute=${brute.size} — permuted-table recall broken")
  }

  test("recall is exactly 1 at the d=3 bound on adversarial signatures, and d=4 pairs are excluded") {
    import spark.implicits._
    // pairs at EVERY Hamming distance 0..4, with the flipped bits
    // placed to straddle block boundaries (offsets 11/22/33/44/54) —
    // the worst case for any blocking scheme. Signatures are built
    // directly (the guarantee is a property of the key scheme, not of
    // the text vote).
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).flatMap { i =>
      val base = rnd.nextLong()
      val d = i % 5
      // flip d bits clustered around a random block edge
      val edge = Seq(11, 22, 33, 44, 54)(rnd.nextInt(5))
      val flips = (0 until d).map(j => 63 - (edge - 2 + j + rnd.nextInt(2)))
      val other = flips.foldLeft(base)((s, b) => s ^ (1L << b))
      Seq((i * 2L, base), (i * 2L + 1, other))
    }
    val sig = rows.toDF("doc_id", "sig64")
      .select(col("doc_id"),
        expr("shiftrightunsigned(sig64, 32)").as("sig_hi"),
        expr("sig64 & 4294967295").as("sig_lo"))
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.sig_hi ^ b.sig_hi) + bit_count(a.sig_lo ^ b.sig_lo)")
          .cast("long").as("hamming"))
      .filter(col("hamming") <= DedupOps.MankuHamMax)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = DedupOps.mankuPairsOf(sig)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === brute, "adversarial recall broken at the distance bound")
    // the constructed set must actually exercise the bound: pairs at
    // d = 3 exist (found), pairs at d = 4 exist (excluded by verify)
    val d3 = (0 until 40).count(_ % 5 == 3)
    val d4 = (0 until 40).count(_ % 5 == 4)
    assert(d3 > 0 && d4 > 0)
    assert(brute.size >= d3, "d<=3 pairs must all be present")
  }

  test("manku64 gate prices the rung on the same sample as the other families") {
    val dir = sf("sf0.01")
    val r = DedupOps.preflightFor(spark, dir, "manku64", 1000.0).collect().head
    assert(r.getAs[Long]("sample_docs") > 0L)
    assert(r.getAs[String]("verdict") == "ok" ||
      r.getAs[String]("verdict") == "refuse")
    // 20 tables of 32-bit keys: projected density on real sf0.01
    // content must price BELOW the 8-bit-block family (the point of
    // the rung)
    val d64 = DedupOps.preflightFor(spark, dir, "simhash", 1000.0)
      .collect().head.getAs[Double]("pairs_per_doc")
    val dm = r.getAs[Double]("pairs_per_doc")
    assert(dm <= d64,
      s"manku64 density $dm above the 8-bit family's $d64 — key space not helping")
  }
}

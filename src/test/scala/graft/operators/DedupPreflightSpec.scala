package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q239 pre-flight gate: the sampled projection must track the
  * TRUE raw candidate volume of the band join it gates, pass real
  * corpora, refuse saturated ones, and actually stop the pair
  * producers when armed. */
class DedupPreflightSpec extends SparkSpec {

  /** Exact raw candidate volume of the q51 band join: Σ n_b(n_b−1)/2
    * over the FULL corpus's (band_id, band_key) buckets, rebuilt here
    * from q50's public signature strings so the spec does not reach
    * into the private band helpers. */
  private def exactRawPairs(dir: String): Long = {
    val sig = DedupOps.q50MinhashSignature.fn(spark, dir)
      .select(col("doc_id"), split(col("signature"), "\\|").as("sig"))
    sig.select(explode(expr(
        """transform(sequence(0, 3), b -> concat(b, ':',
          |  element_at(sig, 2 * b + 1), '|', element_at(sig, 2 * b + 2)))""".stripMargin))
        .as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - lit(1))), lit(0L)).as("s"))
      .collect().head.getLong(0) / 2
  }

  test("q239 projection tracks the exact raw candidate volume on real corpora") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(d)
      val r = DedupOps.preflightFor(spark, dir, "minhash", 1000.0).collect().head
      val exact = exactRawPairs(dir)
      val projected = r.getAs[Double]("projected_pairs")
      assert(r.getAs[Long]("sample_docs") > 0, s"$d: empty 1/4 sample")
      // a 1/4 Bernoulli sample is noisy at these sizes — demand order
      // of magnitude agreement, not equality
      assert(projected >= exact / 8.0 && projected <= exact * 8.0,
        s"$d: projected $projected vs exact $exact raw pairs")
      // the real corpora sit far below the saturation budget
      assert(r.getAs[String]("verdict") === "ok",
        s"$d: real corpus refused (pairs/doc=${r.getAs[Double]("pairs_per_doc")})")
    }
  }

  /** A content-saturated corpus: 2000 docs drawn from 3 distinct
    * texts — every band bucket holds ~a third of the corpus, the
    * q205-at-x100 failure mode in miniature. */
  private def writeSaturated(path: String): Unit = {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs before noon today ok",
      "how vexingly quick daft zebras jump over the sleeping hounds")
    spark.range(2000).select(col("id").as("doc_id"),
        element_at(typedlit(texts), (pmod(col("id"), lit(3)) + 1).cast("int")).as("text"))
      .write.mode("overwrite").parquet(s"$path/documents.parquet")
  }

  test("a saturated corpus is refused, and the armed guard stops both pair producers") {
    val dir = java.nio.file.Files.createTempDirectory("pf_sat").toString
    writeSaturated(dir)
    for (family <- Seq("minhash", "simhash")) {
      val r = DedupOps.preflightFor(spark, dir, family, 1000.0).collect().head
      assert(r.getAs[String]("verdict") === "refuse",
        s"$family: saturated corpus passed (pairs/doc=${r.getAs[Double]("pairs_per_doc")})")
      // the projection must see the ~N²/3-scale bucket blow-up:
      // 2000 docs over 3 texts ⇒ ~666k same-text pairs per band family
      assert(r.getAs[Double]("pairs_per_doc") > 1000.0)
    }
    spark.conf.set("spark.graft.dedup.preflight", "true")
    try {
      val e1 = intercept[IllegalStateException] {
        DedupOps.q51LshJaccardPairs.fn(spark, dir).collect()
      }
      assert(e1.getMessage.contains("preflight (minhash)"))
      val e2 = intercept[IllegalStateException] {
        DedupOps.q90SimhashHamming.fn(spark, dir).collect()
      }
      assert(e2.getMessage.contains("preflight (simhash)"))
      // the real corpus passes the SAME armed gate end to end
      assert(DedupOps.q51LshJaccardPairs.fn(spark, sf("sf0.001")).count() >= 0)
    } finally spark.conf.unset("spark.graft.dedup.preflight")
  }

  /** The r16 failure class: band keys pass (signatures differ, few
    * collisions) but the verify's incidence mass explodes — a tiny
    * shingle space means every candidate doc shares most hashes. The
    * fixed-vocab x100 corpus read 8.2 band pairs/doc "ok", then the
    * slim verify join spilled the disk to DNF (SCALE.md Round 16);
    * the incidence gate prices that join exactly (Σ_h cnt_a·cnt_b,
    * counts multiplied, no rows produced) and must refuse first. */
  test("verify-incidence gate: band-ok but incidence-saturated corpus refuses before the verify join") {
    val dir = java.nio.file.Files.createTempDirectory("pf_inc").toString
    // ~31 tokens/doc over a 4-word vocab: 64 possible 3-gram shingles,
    // so distinct shingle SETS (→ signatures mostly differ, band gate
    // ok) over a saturated shingle SPACE (→ df ~hundreds per hash)
    spark.range(600).select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 30),
          j -> concat('w', pmod(xxhash64(id, j), 4))))""").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val band = DedupOps.preflightFor(spark, dir, "minhash", 1000.0).collect().head
    assert(band.getAs[String]("verdict") === "ok",
      s"fixture no longer band-ok (pairs/doc=${band.getAs[Double]("pairs_per_doc")})")
    spark.conf.set("spark.graft.dedup.preflight", "true")
    try {
      val e = intercept[IllegalStateException] {
        DedupOps.q51LshJaccardPairs.fn(spark, dir).collect()
      }
      assert(e.getMessage.contains("verify incidence"))
    } finally spark.conf.unset("spark.graft.dedup.preflight")
    // disarmed, the same query completes (the fixture is small)
    assert(DedupOps.q51LshJaccardPairs.fn(spark, dir).count() > 0)
  }

  test("budget override is honored and the gate defaults off") {
    // absurdly low budget refuses even the real corpus when armed...
    spark.conf.set("spark.graft.dedup.preflight", "true")
    spark.conf.set("spark.graft.dedup.preflightBudget", "0.000001")
    try {
      intercept[IllegalStateException] {
        DedupOps.q51LshJaccardPairs.fn(spark, sf("sf0.001")).collect()
      }
    } finally {
      spark.conf.unset("spark.graft.dedup.preflight")
      spark.conf.unset("spark.graft.dedup.preflightBudget")
    }
    // ...and with the conf unset the same query runs the join freely
    assert(DedupOps.q51LshJaccardPairs.fn(spark, sf("sf0.001")).count() >= 0)
  }
}

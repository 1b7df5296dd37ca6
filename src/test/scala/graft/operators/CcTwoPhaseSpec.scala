package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-phase (large-star/small-star) connected components, q205:
  * fixed-point correctness on constructed graphs, algorithm-
  * independence against the min-label iteration, and the round-count
  * claim that justifies its existence — convergence independent of
  * component diameter (Kiveris et al., SoCC 2014). */
class CcTwoPhaseSpec extends SparkSpec {

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("doc_a", "doc_b")
  }

  private def labelsOf(pairs: DataFrame): Map[Long, Long] =
    DedupOps.twoPhaseComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path, star, and multi-component graphs all label with the component min") {
    // path 1-2-3-4-5
    assert(labelsOf(pairsDf(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)))
      == (1L to 5L).map(_ -> 1L).toMap)
    // star centered high (7 is the hub, 1 the min leaf)
    assert(labelsOf(pairsDf(Seq(7L -> 1L, 7L -> 4L, 7L -> 9L)))
      == Map(1L -> 1L, 4L -> 1L, 7L -> 1L, 9L -> 1L))
    // two components + reversed/duplicated edge input
    assert(labelsOf(pairsDf(Seq(10L -> 11L, 11L -> 10L, 11L -> 12L, 20L -> 21L)))
      == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("round count is diameter-independent: a 100-node path converges in O(log n) rounds") {
    import spark.implicits._
    val path = pairsDf((1L until 100L).map(i => i -> (i + 1)))
    // count alternating rounds to fixed point directly
    var edges = path.select(greatest($"doc_a", $"doc_b").as("u"),
        least($"doc_a", $"doc_b").as("v")).distinct().localCheckpoint()
    var rounds = 0
    var done = false
    while (!done && rounds < 30) {
      val next = DedupOps.twoPhaseRound(edges).localCheckpoint()
      done = next.except(edges).isEmpty && edges.except(next).isEmpty
      edges = next
      rounds += 1
    }
    assert(done, "two-phase must converge")
    assert(rounds <= 10,
      s"two-phase took $rounds rounds on a diameter-99 path — expected O(log n)")
    // min-label on the same graph is diameter-bound: it must NOT have
    // converged after 10 rounds (the label walks ~one hop per round)
    val partial = DedupOps.minLabelComponents(path, maxRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial.values.exists(_ != 1L),
      "min-label converging in 10 rounds on a 99-hop path would falsify the claim")
    // …while the star labels are already exact
    assert(labelsOf(path) == (1L to 100L).map(_ -> 1L).toMap)
  }

  test("q205 equals q91 on the real SimHash dup graph (different algorithm, same clustering)") {
    val dir = sf("sf0.001")
    val a = DedupOps.q205CcTwophase.fn(spark, dir).collect().map(_.toString)
    val b = DedupOps.q91DupClusters.fn(spark, dir).collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("fingerprint contraction is exact where it matters most: a saturated corpus") {
    // 600 docs, 3 distinct texts → 3 fingerprint supernodes standing
    // in for 600 nodes and ~60k clique edges; the doc-level reference
    // (simhashPairs + twoPhaseComponents) must agree row-for-row
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "pack my box with five dozen liquor jugs before noon today ok",
      "how vexingly quick daft zebras jump over the sleeping hounds")
    val dir = java.nio.file.Files.createTempDirectory("ctr_sat").toString
    spark.range(600).select(col("id").as("doc_id"),
        element_at(typedlit(texts), (pmod(col("id"), lit(3)) + 1).cast("int"))
          .as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val contracted = DedupOps.q205CcTwophase.fn(spark, dir)
      .collect().map(_.toString).toSeq
    val pairs = DedupOps.simhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val labels = DedupOps.twoPhaseComponents(pairs)
      .select(col("id").as("doc_id"), col("label"))
    val reference = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("canonical"))
      .withColumn("is_canonical", col("canonical") === col("doc_id"))
      .orderBy(col("doc_id"))
      .collect().map(_.toString).toSeq
    assert(contracted == reference)
    // and the contraction really contracted: 3 supernodes, not 600
    val fp = DedupOps.fingerprintsOf(DedupOps.packedSimhash(spark, dir))
    assert(fp.count() === 3)
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The packed (integer shift/mask) SimHash build must be bit-identical
  * to the string-voting form q53 outputs and the oracle SQL replays —
  * it is the same majority vote, restated as `2·sum(bit) ≥ n` over the
  * hex-parsed token hash instead of per-character instr/substr. */
class SimhashPackedSpec extends SparkSpec {

  test("packedSimhash equals the q53 bit string on every document") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(d)
      val fromString = DedupOps.q53Simhash.fn(spark, dir)
        .select(col("doc_id"),
          expr("cast(conv(substr(simhash, 1, 32), 2, 10) as bigint)").as("sig_hi"),
          expr("cast(conv(substr(simhash, 33, 32), 2, 10) as bigint)").as("sig_lo"))
      val packed = DedupOps.packedSimhash(spark, dir)
      assert(fromString.except(packed).isEmpty &&
        packed.except(fromString).isEmpty,
        s"packed SimHash diverges from the bit-string form at $d")
    }
  }

  test("simhashPairs equals the sorted q90 contract") {
    val dir = sf("sf0.001")
    val a = DedupOps.q90SimhashHamming.fn(spark, dir).collect().toSeq
    val sorted = a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sorted == sorted.sortBy(t => (t._1, t._2)), "q90 must stay sorted")
    assert(sorted.nonEmpty, "sf0.001 must produce at least one near-dup pair")
  }
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 128-bit SimHash family (q242): the packed shift/mask build must
  * equal the 128-char string vote bit-for-bit, and the 16-bit-block
  * pigeonhole banding must find EXACTLY the brute-force Hamming ≤ 7
  * pairs — the recall guarantee the key-space escape rides on. */
class Simhash128Spec extends SparkSpec {

  test("packed 128-bit build equals the string-vote form word-for-word") {
    val dir = sf("sf0.001")
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .withColumn("h", expr("substr(sha2(tok, 256), 1, 32)"))
    // the oracle's exact expression, evaluated in Spark
    val bits = (0 until 128).map { b =>
      val j = b / 4 + 1
      val p = 1 << (b % 4)
      s"""case when sum(2 * (cast(floor((instr('0123456789abcdef', substr(h, $j, 1)) - 1) / $p.0) as int) % 2) - 1) >= 0 then '1' else '0' end"""
    }
    val fromString = toks.groupBy(col("doc_id"))
      .agg(expr(s"concat(${bits.mkString(", ")}) as simhash"))
      .select(col("doc_id"),
        expr("cast(conv(substr(simhash, 1, 32), 2, 10) as bigint)").as("s0"),
        expr("cast(conv(substr(simhash, 33, 32), 2, 10) as bigint)").as("s1"),
        expr("cast(conv(substr(simhash, 65, 32), 2, 10) as bigint)").as("s2"),
        expr("cast(conv(substr(simhash, 97, 32), 2, 10) as bigint)").as("s3"))
    val packed = DedupOps.packedSimhash128Of(
      spark.read.parquet(s"$dir/documents.parquet"))
    assert(fromString.except(packed).isEmpty &&
      packed.except(fromString).isEmpty,
      "packed 128-bit SimHash diverges from the bit-string form")
  }

  test("banded q242 pairs equal brute-force exact Hamming <= 7 (recall guarantee)") {
    val dir = sf("sf0.001")
    val sig = DedupOps.packedSimhash128Of(
      spark.read.parquet(s"$dir/documents.parquet"))
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.s0 ^ b.s0) + bit_count(a.s1 ^ b.s1) + " +
          "bit_count(a.s2 ^ b.s2) + bit_count(a.s3 ^ b.s3)")
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = DedupOps.q242Simhash128Pairs.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute,
      s"banded=${banded.size} brute=${brute.size} — pigeonhole recall broken")
    assert(brute.nonEmpty, "sf0.001 must contain at least one 128-bit near-dup")
  }

  test("the 16-bit key space prices far below the 8-bit family on the same sample") {
    // the gate readings that motivate the family: same corpus, same
    // budget — the 128-bit family's projected density must come in
    // well under the 64-bit family's
    val dir = sf("sf0.01")
    val d64 = DedupOps.preflightFor(spark, dir, "simhash", 1000.0)
      .collect().head.getAs[Double]("pairs_per_doc")
    val d128 = DedupOps.preflightFor(spark, dir, "simhash128", 1000.0)
      .collect().head.getAs[Double]("pairs_per_doc")
    assert(d128 < d64,
      s"128-bit density $d128 should undercut 64-bit $d64")
  }
}

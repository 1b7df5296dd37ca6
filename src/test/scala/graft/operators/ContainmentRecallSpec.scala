package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** q245's recall guarantee: probing with the ⌊0.2·|A|⌋+1 smallest
  * hashes finds EVERY pair whose small-side containment is ≥ 0.8
  * (pigeonhole: |A\B| < probe count forces a shared probed hash), and
  * the operator exhibits exactly the subset pairs the
  * resemblance-recalled q241 provably misses. */
class ContainmentRecallSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-contain").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("banded recall equals brute-force containment >= 0.8 on the real corpus") {
    val dir = sf("sf0.001")
    val hashed = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), trim(col("text")).as("t"),
        split(trim(col("text")), "\\s+").as("w"))
      .withColumn("shingles", expr(
        """case when size(w) >= 3
          | then array_distinct(transform(sequence(1, size(w) - 2),
          |   i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
          | else array(t) end""".stripMargin))
      .select(col("doc_id"),
        expr("transform(shingles, s -> sha2(s, 256))").as("hashes"))
    // brute: every small-side-oriented pair with containment >= 0.8
    val brute = hashed.as("a").join(hashed.as("b"),
        col("a.doc_id") =!= col("b.doc_id") &&
          (size(col("a.hashes")) < size(col("b.hashes")) ||
            (size(col("a.hashes")) === size(col("b.hashes")) &&
              col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("bg"),
        (size(array_intersect(col("a.hashes"), col("b.hashes"))).cast("double") /
          size(col("a.hashes"))).as("c"))
      .filter(col("c") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupOps.containmentRecallOf(hashed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute,
      s"got=${got.size} brute=${brute.size} — containment recall bound broken")
  }

  test("q245 finds the subset pair q241's resemblance bands miss") {
    // doc 2 is a CONTIGUOUS prefix of doc 1 → its shingles are a
    // strict subset (containment 1.0) but resemblance ≈ 10/58 ≈ 0.17,
    // far below any near-dup band threshold
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val small = (1 to 12).map(i => s"tok$i").mkString(" ")
    val dir = writeDocs(Seq((1L, big), (2L, small),
      (3L, (100 to 140).map(i => s"other$i").mkString(" "))))
    val q241 = DedupOps.q241ContainmentPairs.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!q241.contains((1L, 2L)) && !q241.contains((2L, 1L)),
      "construction failed: the subset pair must NOT be a resemblance candidate")
    val q245 = DedupOps.q245ContainmentRecall.fn(spark, dir).collect()
    val hit = q245.filter(r => r.getLong(0) == 2L && r.getLong(1) == 1L)
    assert(hit.length == 1, s"q245 must recall the subset pair, got ${q245.toSeq}")
    assert(hit.head.getAs[Double]("containment") === 1.0)
    assert(hit.head.getAs[String]("relation") === "subset")
  }

  test("containment gate projects and prices the probe-index join") {
    val dir = sf("sf0.01")
    val r = DedupOps.preflightFor(spark, dir, "containment", 1000.0)
      .collect().head
    assert(r.getAs[Long]("sample_docs") > 0L)
    assert(r.getAs[Long]("sample_pairs") >= 0L)
    assert(Set("ok", "refuse")(r.getAs[String]("verdict")))
  }
}

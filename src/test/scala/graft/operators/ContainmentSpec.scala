package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q241 containment classification: the overlap coefficient must be
  * the exact set arithmetic it claims, the relation tiers must match
  * their thresholds, and the classic cases — exact duplicate
  * (near_dup) and doc-inside-doc (subset) — must come out as named.
  */
class ContainmentSpec extends SparkSpec {

  /** Distinct 3-shingle set of a text, the q50 definition. */
  private def shingleSet(text: String): Set[String] = {
    val w = text.trim.split("\\s+")
    if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
    else Set(text.trim)
  }

  test("sf0.01: every candidate pair's arithmetic and relation tier is internally exact") {
    val rows = DedupOps.q241ContainmentPairs.fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty, "no candidate pairs at sf0.01")
    rows.foreach { r =>
      val (na, nb, nc) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_common"))
      assert(nc <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      val c = r.getAs[Double]("containment")
      assert(math.abs(j - nc.toDouble / (na + nb - nc)) < 1e-6)
      assert(math.abs(c - nc.toDouble / math.min(na, nb)) < 1e-6)
      assert(c >= j - 1e-9, "containment can never sit below resemblance")
      val want = if (j >= 0.8) "near_dup" else if (c >= 0.8) "subset" else "partial"
      assert(r.getAs[String]("relation") === want)
    }
  }

  test("exact duplicates classify near_dup; a doc inside a bigger doc classifies subset") {
    val big = (1 to 60).map(i => s"tk$i").mkString(" ")
    // a contiguous interior slice: every one of its shingles is big's
    val inner = (11 to 30).map(i => s"tk$i").mkString(" ")
    val texts = Seq(
      (0L, big), (1L, big),        // exact pair: every band collides
      (2L, inner),                 // containment 1.0, jaccard 18/58
      (3L, "zz alpha beta gamma delta epsilon zeta eta theta iota"))
    val dir = java.nio.file.Files.createTempDirectory("q241").toString
    spark.createDataFrame(texts).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupOps.q241ContainmentPairs.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    val dup = rows((0L, 1L))
    assert(dup.getAs[Double]("jaccard") === 1.0)
    assert(dup.getAs[String]("relation") === "near_dup")
    // the subset pair reaches the candidate set only if a band
    // collides (LSH recalls resemblance — the documented bias); when
    // it does, it MUST classify subset, and its numbers must match
    // the set arithmetic recomputed from the raw texts
    rows.get((0L, 2L)).foreach { r =>
      val (sa, sb) = (shingleSet(big), shingleSet(inner))
      assert(r.getAs[Long]("n_common") === (sa & sb).size)
      assert(r.getAs[Double]("containment") === 1.0)
      assert(r.getAs[String]("relation") === "subset")
    }
    // unrelated docs never pair with anything
    assert(!rows.keys.exists { case (a, b) => a == 3L || b == 3L })
  }
}

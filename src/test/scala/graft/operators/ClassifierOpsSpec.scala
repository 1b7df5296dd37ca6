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
}

package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RetrieversSpec extends SparkSpec {
  import Retrievers._

  /** Chunk fixture with hand-placed vectors (dim 4, unit-ish). */
  private lazy val chunks: DataFrame = {
    import spark.implicits._
    Seq(
      ("d1", 0L, "spark joins and shuffles", Seq(1f, 0f, 0f, 0f)),
      ("d1", 1L, "window functions in spark", Seq(0.9f, 0.1f, 0f, 0f)),
      ("d1", 2L, "totally unrelated cooking", Seq(0f, 0f, 1f, 0f)),
      ("d2", 0L, "spark aggregations guide", Seq(0.8f, 0.2f, 0f, 0f)),
      ("d2", 1L, "negative direction", Seq(-1f, 0f, 0f, 0f))
    ).toDF("doc_id", "chunk_id", "text", "embedding")
  }

  private val q = Query(Seq(1f, 0f, 0f, 0f), "how do spark joins work")

  test("simple: top-k by score, non-positive dropped, doc filter") {
    val got = simple(chunks, q, k = 3).select("doc_id", "chunk_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == ("d1", 0L))
    assert(!got.contains(("d2", 1L)))          // negative score dropped
    val filtered = simple(chunks, q, k = 3, docId = Some("d2"))
      .select("doc_id").distinct().collect().map(_.getString(0))
    assert(filtered.toSeq == Seq("d2"))
  }

  test("subquestion: union of sub-retrievals, deduped") {
    val subs = Seq(q, Query(Seq(0f, 0f, 1f, 0f), "cooking?"))
    val got = subquestion(chunks, subs, k = 2)
    assert(got.count() >= 3)
    assert(got.select("doc_id", "chunk_id").distinct().count() == got.count())
  }

  test("fusion: rrf over query variations prefers consistent hits") {
    val got = fusion(chunks, Seq(q, Query(Seq(0.9f, 0.1f, 0f, 0f))), k = 3)
      .select("doc_id", "chunk_id", "score").collect()
    assert(got.length == 3)
    assert(got.head.getString(0) == "d1" && got.head.getLong(1) == 0L)
    assert(got.map(_.getDouble(2)).sliding(2).forall(p => p.head >= p.last))
  }

  test("fusion scans the chunk table once per variation, not per k-scale") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fusion").toString
    val n = 500
    (0 until n).map(i => ("d", i.toLong, s"t$i", Seq(1f / (i + 1), 1f, 0f, 0f)))
      .toDF("doc_id", "chunk_id", "text", "embedding")
      .repartition(4).write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val records = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          records.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = fusion(persisted, Seq(q, Query(Seq(0.5f, 0.5f, 0f, 0f))), k = 3).collect()
      assert(got.length == 3)
      // listener events are async: poll until the count stabilizes
      val deadline = System.currentTimeMillis() + 10000
      var last = -1L
      while (System.currentTimeMillis() < deadline && records.get != last) {
        last = records.get; Thread.sleep(300)
      }
      // 2 variations × one scan of n rows (+ small cached top-2k reads);
      // the per-(variation × k-scale) form would read ≥ 3× that
      assert(records.get >= 2L * n, s"records=${records.get}")
      assert(records.get < 3L * n, s"fusion re-scanned the chunk table: ${records.get}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("keywordTable: inverted-index hit counting") {
    val got = keywordTable(chunks, Seq("spark", "joins"), k = 5)
      .select("chunk_id", "score").collect()
    // "spark joins and shuffles" hits 2 distinct keywords
    assert(got.head.getLong(0) == 0L && got.head.getDouble(1) == 2.0)
  }

  test("automerging: parent replaces chunks when most children hit") {
    import spark.implicits._
    val parents = Seq(
      ("d1", 0L, "p1"), ("d1", 1L, "p1"),   // both children of p1 likely hit
      ("d1", 2L, "p2"), ("d2", 0L, "p3"), ("d2", 1L, "p3")
    ).toDF("doc_id", "chunk_id", "parent_id")
    val got = automerging(chunks, parents, q, k = 5, threshold = 0.5)
      .select("chunk_id").collect().map(_.getString(0))
    assert(got.contains("p1"))               // merged parent id replaces children
    assert(!got.contains("0") || !got.contains("1"))
  }

  test("recursive: reference hits expand to children, leaf hits pass through") {
    import spark.implicits._
    // roots: r1 is a reference node (has children), r2 is a leaf summary
    val roots = Seq(
      ("d1", 10L, "summary of join docs", Seq(1f, 0f, 0f, 0f)),
      ("d1", 20L, "leaf summary", Seq(0.8f, 0.2f, 0f, 0f)),
      ("d1", 30L, "irrelevant summary", Seq(0f, 0f, 1f, 0f))
    ).toDF("doc_id", "chunk_id", "text", "embedding")
    val children = Seq(
      ("d1", 10L, 11L, "join child a", Seq(0.95f, 0f, 0f, 0f)),
      ("d1", 10L, 12L, "join child b", Seq(0.5f, 0.5f, 0f, 0f)),
      ("d1", 10L, 13L, "off-topic child", Seq(-1f, 0f, 0f, 0f))
    ).toDF("doc_id", "parent_id", "chunk_id", "text", "embedding")
    val got = recursive(roots, children, q, k = 4)
      .select("chunk_id").collect().map(_.getLong(0))
    // reference root 10 replaced by its positive children; leaf 20 kept
    assert(!got.contains(10L))
    assert(got.contains(11L) && got.contains(12L) && got.contains(20L))
    assert(!got.contains(13L)) // negative child dropped
  }

  test("router dispatches by decision") {
    val viaKeyword = router(chunks, q, _ => "keyword", keywords = Seq("cooking"))
    assert(viaKeyword.select("chunk_id").collect().head.getLong(0) == 2L)
    val viaSimple = router(chunks, q, _ => "simple")
    assert(viaSimple.select("chunk_id").collect().head.getLong(0) == 0L)
  }

  test("fullContext shortcut returns the whole doc as one row") {
    import spark.implicits._
    val docs = Seq(("d9", "whole document text")).toDF("doc_id", "text")
    val got = fullContext(docs, "d9").collect()
    assert(got.length == 1 && got.head.getAs[String]("text") == "whole document text")
  }
}

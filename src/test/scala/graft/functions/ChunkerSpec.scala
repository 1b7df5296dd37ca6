package graft.functions

import graft.SparkSpec
import org.scalacheck.Gen

class ChunkerSpec extends SparkSpec {

  test("chunkText: empty and single-word") {
    assert(Chunker.chunkText("", 10, 2).isEmpty)
    assert(Chunker.chunkText("   ", 10, 2).isEmpty)
    assert(Chunker.chunkText("hello", 10, 2) == Seq("hello"))
  }

  test("chunkText: packs words up to size") {
    val got = Chunker.chunkText("aa bb cc dd ee", 5, 0)
    assert(got == Seq("aa bb", "cc dd", "ee"))
  }

  test("chunkText: overlap carries trailing words") {
    val got = Chunker.chunkText("aa bb cc dd ee", 5, 2)
    // after "aa bb", overlap budget 2 carries "bb" into the next chunk
    assert(got.head == "aa bb")
    assert(got(1).startsWith("bb"))
  }

  test("chunkText properties: coverage + bounded size") {
    val word = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    val text = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    forAll(text) { t =>
      val chunks = Chunker.chunkText(t, 20, 5)
      val words = t.trim.split("\\s+").filter(_.nonEmpty)
      // every word appears in some chunk (words longer than size are truncated)
      assert(words.filter(_.length <= 20).forall(w => chunks.exists(_.contains(w))))
      // no chunk materially exceeds the window
      assert(chunks.forall(_.length <= 20 + 1))
      // chunk word sequence (minus overlaps) reconstructs the doc order
      if (words.nonEmpty) assert(chunks.nonEmpty)
    }
  }

  test("explodeChunks covers full text with overlap continuity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val rows = Chunker.explodeChunks(df, "text", "n_chars", 16, 4)
      .orderBy("chunk_id").select("chunk_text").as[String].collect()
    assert(rows.head.length == 16)
    // consecutive windows share the 4-char overlap
    assert(rows(0).takeRight(4) == rows(1).take(4))
    assert(rows.mkString.nonEmpty)
  }
}

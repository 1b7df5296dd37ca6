package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking (SURVEY.md D3; reference SentenceSplitter use at
  * unstract/sdk1/src/unstract/sdk1/index.py:389-449, defaults 512/128 at
  * workers/executor/executors/legacy_executor.py:1109-1110).
  *
  * Two implementations:
  *  1. `chunkExprs` — a pure-Column sliding character window
  *     (sequence + explode), fully distributed, pushdown-friendly, used by
  *     the engine's index stage. At 100 TB this is a narrow map stage —
  *     no shuffle, no driver involvement.
  *  2. `chunkText` — the sentence/word-aware splitter (greedy word packing
  *     with overlap, mirroring SentenceSplitter semantics) used where
  *     exact reference chunk boundaries matter; exposed as a Scala
  *     function and unit-tested, applied via Column `transform` or
  *     mapPartitions when needed.
  */
object Chunker {

  /** Number of character chunks for a doc of length `len` with window
    * `size` and `step = size - overlap`: ceil((len - overlap) / step),
    * min 1. */
  def chunkWindows(lenCol: Column, size: Int, overlap: Int): Column = {
    val step = size - overlap
    greatest(ceil((lenCol.cast("double") - lit(overlap.toDouble)) / lit(step.toDouble)).cast("long"), lit(1L)) - lit(1L)
  }

  /** Explode a text column into (chunk_id, chunk_text) character windows. */
  def explodeChunks(df: DataFrame, textCol: String, lenCol: String,
      size: Int, overlap: Int): DataFrame = {
    val step = size - overlap
    df.withColumn("chunk_id", explode(sequence(lit(0L), chunkWindows(col(lenCol), size, overlap))))
      .withColumn("chunk_text",
        expr(s"substring($textCol, cast(chunk_id * $step + 1 as int), $size)"))
  }

  /** Word-aware greedy splitter: pack whole words up to `size` chars per
    * chunk, carrying `overlap` chars of trailing words into the next
    * chunk. Deterministic, pure. */
  def chunkText(text: String, size: Int, overlap: Int): Seq[String] = {
    require(size > 0 && overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Seq.empty
    val chunks = Seq.newBuilder[String]
    var cur = new StringBuilder
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (cur.nonEmpty && cur.length + 1 + w.length > size) {
        chunks += cur.toString
        // carry back whole words from the tail until `overlap` chars
        var tail = List.empty[String]
        var tlen = 0
        var j = i - 1
        while (j >= 0 && tlen + words(j).length + (if (tail.isEmpty) 0 else 1) <= overlap) {
          tlen += words(j).length + (if (tail.isEmpty) 0 else 1)
          tail = words(j) :: tail
          j -= 1
        }
        cur = new StringBuilder(tail.mkString(" "))
      }
      if (cur.nonEmpty) cur.append(' ')
      cur.append(if (w.length > size) w.substring(0, size) else w)
      i += 1
    }
    if (cur.nonEmpty) chunks += cur.toString
    chunks.result()
  }

  /** Index key (doc_id in the reference): sha256 over content hash +
    * adapter configs + chunk params (sdk1/index.py:460-516). */
  def indexKey(contentHash: Column, embeddingAdapter: String,
      vectorDb: String, x2text: String, size: Int, overlap: Int): Column =
    sha2(concat_ws("|", contentHash, lit(embeddingAdapter), lit(vectorDb),
      lit(x2text), lit(size.toString), lit(overlap.toString)), 256)
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE merge learning proven against an independent driver-side
  * reference implementation of the published algorithm on the real
  * corpus — the no-oracle correctness convention (q77). */
class TokenizerOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** Code-point split, matching Spark's split(word, "") — a UTF-16
    * char split would shear supplementary characters (emoji) into
    * lone surrogates and diverge from the operator. */
  private def codePoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Code-point lexicographic string order — Spark's string comparison
    * is binary UTF-8, which sorts by code point; Scala's default
    * String ordering is UTF-16 code-unit order and diverges for
    * supplementary characters vs chars >= U+E000, so the reference
    * must compare by code points to pin the operator's tie-break. */
  private val cpOrdering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compare(a.codePoints().toArray, b.codePoints().toArray)

  /** Reference BPE (Sennrich et al. 2016): plain Scala over the word
    * frequency map, structured independently of the Column fold. */
  private def referenceBpe(wordFreq: Map[String, Long],
      n: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = wordFreq.map {
      case (w, f) => codePoints(w) -> f
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    for (_ <- 1 to n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) return out.toSeq
      val ((l, r), c) = counts.minBy { case ((a, b), cnt) => (-cnt, a, b) }(
        Ordering.Tuple3(Ordering.Long, cpOrdering, cpOrdering))
      out += ((l, r, c))
      vocab = vocab.map { case (syms, f) =>
        val merged = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2
          } else { merged += syms(i); i += 1 }
        }
        merged.toVector -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.toSeq
  }

  test("q104 merges match the reference BPE algorithm on the real corpus") {
    val got = TokenizerOps.q104BpeMerges.fn(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.length === 8)
    val wordFreq = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wordFreq, 8)
    assert(got.toSeq === want,
      s"merge sequences diverge:\n got=${got.toSeq}\nwant=$want")
  }

  test("q105 per-doc BPE token counts match an independent reference encoder") {
    val wordFreq = graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merges = referenceBpe(wordFreq, 8).map { case (l, r, _) => (l, r) }
    // Canonical encoder (Sennrich apply_bpe / GPT-2): repeatedly merge
    // all occurrences of the lowest-rank pair present, re-scanning
    // after each application, until no learned pair remains.
    val rank = merges.zipWithIndex.toMap
    def encode(word: String): Int = {
      var syms = codePoints(word)
      var continue = true
      while (continue) {
        val present = syms.sliding(2).collect {
          case Vector(a, b) if rank.contains((a, b)) => (a, b)
        }.toVector
        if (present.isEmpty) continue = false
        else {
          val (l, r) = present.minBy(rank)
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toVector
        }
      }
      syms.length
    }
    val want = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        // Locale.ROOT: Spark's lower() is locale-independent; a default-
        // locale toLowerCase would diverge on e.g. Turkish dotless-i
        val toks = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .trim.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> toks.map(encode).sum.toLong
      }.filter(_._2 > 0).toMap
    val rows = TokenizerOps.q105BpeEncode.fn(spark, dir).collect()
    val got = rows
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("n_bpe_tokens"))).toMap
    assert(got.keySet === want.keySet)
    val diffs = want.collect { case (id, n) if got(id) != n => (id, n, got(id)) }
    assert(diffs.isEmpty, s"encoder diverges on ${diffs.take(3)}")
    // merges actually compress: total BPE tokens < total characters
    val (chars, bpe) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(bpe < chars, s"no compression: $bpe tokens vs $chars chars")
  }

  test("encodeSyms is the canonical fixpoint, not the one-pass-per-rank variant") {
    // merges: rank 1 = ("ab","c"), rank 2 = ("a","b"). Word "abc":
    //  - one pass per rank in rank order: rank 1 absent over [a,b,c],
    //    rank 2 gives [ab, c], done → 2 tokens, and the rank-1 pair
    //    ("ab","c") it just created is never revisited.
    //  - canonical (lowest-rank-present, re-scan to fixpoint): rank 2
    //    gives [ab, c], re-scan finds rank 1 now present → [abc].
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("abc", Seq("a", "b", "c"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("syms",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    val got = TokenizerOps.encodeSyms(df, Seq(("ab", "c"), ("a", "b")))
      .collect()(0).getSeq[String](1)
    assert(got === Seq("abc"),
      s"expected the canonical fixpoint result [abc], got $got")
  }

  test("q104 merge frequencies are non-increasing in rank on this corpus") {
    // not an invariant of BPE in general (a merged symbol can form a
    // MORE frequent pair later), but it holds for the first merges of
    // a natural-language corpus; a violation here means the pair
    // counting is wrong even when the reference comparison passes
    val freqs = TokenizerOps.q104BpeMerges.fn(spark, dir).collect()
      .map(_.getLong(4))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b },
      s"frequencies not non-increasing: ${freqs.toSeq}")
  }
}

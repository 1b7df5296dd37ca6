package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WordPiece training + encoding proven against an independent
  * driver-side reference implementation of the published algorithm
  * (Schuster & Nakajima 2012 / the open-source BERT trainer) on the
  * real corpus — the no-oracle correctness convention (q104's). */
class WordPieceOpsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = sf("sf0.001")

  private def codePoints(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private val cpOrdering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compare(a.codePoints().toArray, b.codePoints().toArray)

  private def initSyms(w: String): Vector[String] =
    codePoints(w).zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }

  /** Reference WordPiece trainer: score = c / (c_l * c_r), ties by
    * code-point order on (l, r), merged token drops r's `##`. */
  private def referenceWp(wordFreq: Map[String, Long],
      n: Int): Seq[(String, String, String, Double)] = {
    var vocab: Map[Vector[String], Long] = wordFreq.map {
      case (w, f) => initSyms(w) -> f
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer[(String, String, String, Double)]()
    val ord = Ordering.Tuple3(
      Ordering.Double.IeeeOrdering.reverse, cpOrdering, cpOrdering)
    for (_ <- 1 to n) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      val units = scala.collection.mutable.Map[String, Long]()
      vocab.foreach { case (syms, f) =>
        syms.foreach(u => units(u) = units.getOrElse(u, 0L) + f)
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (pairs.isEmpty) return out.toSeq
      val ((l, r), _) = pairs.minBy { case ((a, b), c) =>
        (c.toDouble / (units(a).toDouble * units(b).toDouble), a, b)
      }(ord)
      val score = pairs((l, r)).toDouble /
        (units(l).toDouble * units(r).toDouble)
      val merged = l + r.stripPrefix("##")
      out += ((l, r, merged, score))
      vocab = vocab.map { case (syms, f) =>
        val rewritten = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            rewritten += merged; i += 2
          } else { rewritten += syms(i); i += 1 }
        }
        rewritten.toVector -> f
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    out.toSeq
  }

  private def corpusWordFreq: Map[String, Long] =
    graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q140 merges match the reference WordPiece trainer on the real corpus") {
    val got = WordPieceOps.q140WpMerges.fn(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getDouble(4)))
    assert(got.length === 8)
    val want = referenceWp(corpusWordFreq, 8)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3) === ((w._1, w._2, w._3)),
        s"merge sequences diverge:\n got=${got.toSeq}\nwant=$want")
      assert(math.abs(g._4 - w._4) < 1e-12)
    }
  }

  test("the score rule diverges from BPE's count rule where PMI says so") {
    // pair (a,##b) is MORE frequent (100 vs 60) but its units are
    // ubiquitous; WordPiece must pick the rare-unit pair (c,##d) that
    // raw-count BPE would rank second
    val tbl = Seq(("ab", 100L), ("a", 900L), ("b", 900L), ("cd", 60L))
      .toDF("word", "freq")
      .withColumn("syms", WordPieceOps.wpSyms)
    val m = WordPieceOps.wpMergesFrom(tbl, 1)
    assert(m.head._1 === "c" && m.head._2 === "##d" && m.head._3 === "cd")
    assert(math.abs(m.head._4 - 60.0 / (60.0 * 60.0)) < 1e-12)
  }

  test("encodeWord: greedy longest match, continuation markers, whole-word UNK") {
    val vocab = Set("un", "##able", "u", "n", "a", "##a", "##b", "##l", "##e")
    assert(WordPieceOps.encodeWord("unable", vocab) === Seq("un", "##able"))
    // no greedy dead end taken: "u" alone would strand "##n..." — the
    // matcher prefers the longest viable prefix at each step
    assert(WordPieceOps.encodeWord("una", vocab) === Seq("un", "##a"))
    assert(WordPieceOps.encodeWord("xyz", vocab) === Seq(WordPieceOps.Unk),
      "an unmatchable position must collapse the whole word to [UNK]")
    assert(WordPieceOps.encodeWord("ax", vocab) === Seq(WordPieceOps.Unk))
  }

  test("q141 per-doc counts match the reference encoder over the corpus stream") {
    val wordFreq = corpusWordFreq
    val merges = referenceWp(wordFreq, 8)
    val alphabet = wordFreq.keysIterator.flatMap(initSyms).toSet
    val vocab = alphabet ++ merges.map(_._3)
    val pieceCount: Map[String, (Long, Long)] = wordFreq.keysIterator.map { w =>
      val pieces = WordPieceOps.encodeWord(w, vocab)
      w -> (pieces.length.toLong,
        if (pieces == Seq(WordPieceOps.Unk)) 1L else 0L)
    }.toMap
    val want = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues { rows =>
        val ws = rows.map(_.getString(1))
        (ws.map(w => pieceCount(w)._1).sum, ws.map(w => pieceCount(w)._2).sum)
      }.toMap
    val got = WordPieceOps.q141WpEncode.fn(spark, dir).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val (tokens, unks) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_wp_tokens") === tokens)
      assert(r.getAs[Long]("n_unk_words") === unks)
    }
  }
}

package graft.operators

import graft.SparkSpec
import java.nio.file.Files

class SuffixOpsSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-suffix").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  /** Driver-side brute force: the longest token length L at which some
    * L-window occurs >= 2 times anywhere in the corpus, with the
    * distinct tied substrings at that L. */
  private def bruteLongest(docs: Seq[(Long, String)]): Option[(Long, Long, String)] = {
    val ws = docs.map { case (_, t) => toks(t) }
    val maxLen = if (ws.isEmpty) 0 else ws.map(_.length).max
    (maxLen to 1 by -1).iterator.flatMap { L =>
      val counts = scala.collection.mutable.Map.empty[String, Int]
      ws.foreach { w =>
        (0 to w.length - L).foreach { i =>
          val s = w.slice(i, i + L).mkString(" ")
          counts(s) = counts.getOrElse(s, 0) + 1
        }
      }
      val dup = counts.collect { case (s, c) if c >= 2 => s }.toSeq
      if (dup.nonEmpty) Some((L.toLong, dup.size.toLong, dup.min)) else None
    }.nextOption()
  }

  test("q164: handcrafted corpus — known longest repeated substring") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "something else entirely here quick brown fox jumps over the lazy dog"),
      (3L, "unrelated words without repetition at all"))
    val dir = writeDocs(docs)
    val got = SuffixOps.q164LongestDup.fn(spark, dir).collect()
    // "quick brown fox jumps over the lazy dog" (8 tokens) appears in
    // docs 1 and 2; nothing longer repeats
    assert(got.length == 1)
    assert(got.head.getLong(0) == 8L)
    assert(got.head.getLong(1) == 1L)
    assert(got.head.getString(2) == "quick brown fox jumps over the lazy dog")
    assert(bruteLongest(docs).contains((8L, 1L,
      "quick brown fox jumps over the lazy dog")))
  }

  test("q164: within-doc repetition counts — a suffix array sees both copies") {
    val docs = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma epsilon"),
      (2L, "zeta eta theta iota"))
    val dir = writeDocs(docs)
    val got = SuffixOps.q164LongestDup.fn(spark, dir).collect()
    // "alpha beta gamma" repeats INSIDE doc 1 (positions 1 and 5)
    assert(got.length == 1)
    assert(got.head.getLong(0) == 3L && got.head.getString(2) == "alpha beta gamma")
    assert(bruteLongest(docs).contains((3L, 1L, "alpha beta gamma")))
  }

  test("q164: corpus with no repeated substring emits zero rows") {
    val dir = writeDocs(Seq(
      (1L, "one two three"), (2L, "four five six")))
    assert(SuffixOps.q164LongestDup.fn(spark, dir).collect().isEmpty)
  }

  /** Driver reference for [[SuffixOps.suffixRanks]]'s HEAD-rank
    * convention: rank(suffix) = count of strictly-smaller suffixes,
    * WITH multiplicity — so identical suffixes share a rank and the
    * values are exactly the class-head suffix-array indices. */
  private def headRankReference(docs: Seq[(Long, String)]): Map[(Long, Int), Long] = {
    val suffixes = docs.flatMap { case (d, t) =>
      val w = toks(t)
      (1 to w.length).map(i => ((d, i), w.drop(i - 1).toSeq))
    }
    val ord = math.Ordering.Implicits.seqOrdering[Seq, String]
    suffixes.map { case (k, s) =>
      k -> suffixes.count(o => ord.lt(o._2, s)).toLong
    }.toMap
  }

  test("prefix-doubling ranks equal a driver-side generalized suffix sort") {
    val docs = Seq(
      (1L, "b a b a b"),
      (2L, "a b a c"),
      (3L, "c a b a b"))
    val dir = writeDocs(docs)
    val got = SuffixOps.suffixRanks(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1).toInt), r.getLong(2))).toMap
    val want = headRankReference(docs)
    assert(got.keySet == want.keySet)
    // head ranks must agree exactly: same order AND same tie classes
    assert(got.toSeq.sortBy(_._1) == want.toSeq.sortBy(_._1),
      s"\ngot:  ${got.toSeq.sortBy(_._1)}\nwant: ${want.toSeq.sortBy(_._1)}")
  }

  test("suffix ranks survive partition straddles: repeat-heavy random corpus, many partitions") {
    // small alphabet + long docs force large equal-rank classes that
    // straddle the 32 sort partitions for many doubling rounds — the
    // worst case for the two-phase scan's driver fold (class AND run
    // continuation across partition edges, retire lookahead at edges)
    val rnd = new scala.util.Random(42)
    val docs = (1L to 12L).map { d =>
      d -> (1 to 80).map(_ => "w" + rnd.nextInt(3)).mkString(" ")
    }
    val dir = writeDocs(docs)
    val got = SuffixOps.suffixRanks(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1).toInt), r.getLong(2))).toMap
    val want = headRankReference(docs)
    assert(got.keySet == want.keySet)
    assert(got.toSeq.sortBy(_._1) == want.toSeq.sortBy(_._1))
  }

  test("suffix ranks match the driver reference across corpus shapes (saturation, hapax, singletons, dup docs)") {
    // the shapes that exercise every branch of the working-set loop:
    // identical docs (fixpoint/saturation exit), all-hapax docs
    // (everything retires before round 1), 1-token docs (maxLen edge),
    // duplicated suffix classes, plus random mixes over tiny alphabets
    val rnd = new scala.util.Random(1234)
    def randDoc(len: Int, vocab: Int): String =
      (1 to len).map(_ => "t" + rnd.nextInt(vocab)).mkString(" ")
    val shapes: Seq[Seq[(Long, String)]] = Seq(
      // all docs identical: every class saturates, fixpoint exit
      (1L to 5L).map(d => d -> "a b a b a b a b"),
      // all tokens unique corpus-wide: all positions retire at init
      Seq(1L -> "u1 u2 u3 u4", 2L -> "u5 u6 u7"),
      // single 1-token docs: the maxLen = 1 no-round path
      Seq(1L -> "x", 2L -> "x", 3L -> "y"),
      // one doc, heavy internal repetition
      Seq(1L -> ("z " * 30).trim),
      // random mixes: small alphabet forces deep classes and straddles
      (1L to 8L).map(d => d -> randDoc(3 + rnd.nextInt(40), 2)),
      (1L to 6L).map(d => d -> randDoc(1 + rnd.nextInt(25), 5)),
      // duplicated docs mixed with unique ones
      Seq(1L -> "p q r s t", 2L -> "p q r s t", 3L -> randDoc(20, 3),
        4L -> "p q r s"))
    shapes.zipWithIndex.foreach { case (docs, si) =>
      val dir = writeDocs(docs)
      val got = SuffixOps.suffixRanks(spark, dir).collect()
        .map(r => ((r.getLong(0), r.getLong(1).toInt), r.getLong(2))).toMap
      val want = headRankReference(docs)
      assert(got.keySet == want.keySet, s"shape $si: key sets differ")
      assert(got.toSeq.sortBy(_._1) == want.toSeq.sortBy(_._1),
        s"shape $si diverged:\ngot:  ${got.toSeq.sortBy(_._1).take(20)}" +
          s"\nwant: ${want.toSeq.sortBy(_._1).take(20)}")
    }
  }

  test("cross-operator: q98 shared spans imply q164 dup_len >= SpanLen") {
    // q98's windows are CROSS-DOC duplicated 10-token spans; any such
    // span is a repeated substring of length >= 10, so the suffix
    // array's answer must bound it — the surrogate and the true
    // matcher agreeing on real data
    val dir = sf("sf0.001")
    val anyShared = graft.operators.LmOps.q98DupSpans.fn(spark, dir)
      .filter(org.apache.spark.sql.functions.col("n_dup_spans") > 0)
      .limit(1).count() > 0
    if (anyShared) {
      val got = SuffixOps.q164LongestDup.fn(spark, dir).collect()
      assert(got.nonEmpty && got.head.getLong(0) >= 10L,
        s"q98 found cross-doc 10-token spans but q164 says " +
          s"longest dup = ${got.headOption.map(_.getLong(0))}")
    }
  }

  test("q168: contamination depth on a handcrafted corpus") {
    // doc 7 is the benchmark (doc_id % 10 == 7); doc 1 embeds a 5-token
    // run of it, doc 2 a 2-token run, doc 3 nothing
    val docs = Seq(
      (7L, "alpha beta gamma delta epsilon zeta"),
      (1L, "xx yy beta gamma delta epsilon zeta qq"),
      (2L, "delta epsilon pp rr ss"),
      (3L, "completely disjoint token stream"))
    val dir = writeDocs(docs)
    val got = SuffixOps.q168ContamDepth.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 5L, 2L -> 2L))
  }

  test("q168 agrees with driver brute force on real sf0.001 documents") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val benchWindows = scala.collection.mutable.Set.empty[(Int, String)]
    docs.filter(_._1 % 10 == 7).foreach { case (_, t) =>
      val w = toks(t)
      for (l <- 1 to w.length; i <- 0 to w.length - l)
        benchWindows += ((l, w.slice(i, i + l).mkString(" ")))
    }
    val want = docs.filter(_._1 % 10 != 7).flatMap { case (d, t) =>
      val w = toks(t)
      val best = (w.length to 1 by -1).find { l =>
        (0 to w.length - l).exists(i =>
          benchWindows((l, w.slice(i, i + l).mkString(" "))))
      }
      best.map(l => d -> l.toLong)
    }.toMap
    val got = SuffixOps.q168ContamDepth.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("q164 agrees with driver brute force on real sf0.001 documents") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = bruteLongest(docs)
    val got = SuffixOps.q164LongestDup.fn(spark, dir).collect()
    want match {
      case None => assert(got.isEmpty)
      case Some((l, n, s)) =>
        assert(got.length == 1)
        assert((got.head.getLong(0), got.head.getLong(1), got.head.getString(2))
          == ((l, n, s)))
    }
  }
}

package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training and encoding (Kudo 2018, the
  * SentencePiece unigram model) — the other public tokenizer family
  * next to TokenizerOps' BPE. The model is a piece vocabulary with
  * probabilities; training alternates EM (expected piece counts via
  * forward-backward over every word's segmentation lattice, Kudo §3.2)
  * with loss-based pruning (drop the pieces whose removal least
  * reduces corpus likelihood, approximated per piece as
  * `count · (logp − altLogp)` with altLogp the piece's own best
  * segmentation by OTHER pieces — the SentencePiece trainer's
  * approximation); encoding is the Viterbi-best segmentation.
  *
  * Scale design: all heavy passes run over the DISTINCT-word frequency
  * table (vocabulary-sized, Heaps' law — the same discipline as BPE
  * training, TokenizerOps): seed-substring counting is one explode +
  * weighted count with a TakeOrdered cap, and every EM round is one
  * mapPartitions over that table with the piece table as a broadcast
  * map, emitting (piece, expected_count) pairs that aggregate to a
  * MODEL-sized result. The piece table is driver-held BY CONSTRUCTION
  * (seed cap ≈ 10⁵–10⁶ rows, like the centroid/codebook/merge-list
  * seams); the corpus itself is touched exactly once to build the word
  * table. Encoding segments each distinct word once and joins the
  * segmentation back onto the corpus word stream (q105's join-back).
  *
  * Ties in Viterbi (equal log-prob paths) break toward FEWER pieces,
  * then the lexicographically earlier first piece — an explicit
  * convention (any consistent rule is valid; path scores are sums of
  * the same doubles in the same left-to-right order, so both the
  * operator and the spec's independent reference resolve ties
  * identically).
  */
object UnigramOps {

  private val SeedMaxLen = 4     // max seed-piece length (code points)
  private val MaxSeeds = 400     // seed-vocabulary cap (driver-sized seam)
  private val TargetVocab = 80   // final piece count (incl. single chars)
  private val EmRoundsPerPrune = 2
  private val PruneKeep = 0.8    // keep ratio per prune round
  private val ProbFloor = 1e-12  // required single chars never hit -inf

  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Staging.materialize(df, tag, "spark.graft.corpus.stagingDir")

  /** (word, freq) — the distinct-word table, shared tokenization with
    * the LM/BPE tiers. */
  private def wordFreq(d: DataFrame): DataFrame =
    materialize(LmOps.tokenizedOf(d)
      .select(explode(col("w")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq")), "ug_words")

  /** Code-point split (matches split(word, "") / BPE's symbol unit). */
  private[operators] def codePoints(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Code-point lexicographic order — matches Spark's binary UTF-8
    * string comparison, so driver-side tie-breaks agree with the
    * distributed seed ordering (TokenizerOpsSpec's convention). */
  private val cpOrdering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compare(a.codePoints().toArray, b.codePoints().toArray)

  private val lossOrdering: Ordering[(String, Double)] = {
    val byKey = Ordering.Tuple2(Ordering.Double.TotalOrdering, cpOrdering)
    (x: (String, Double), y: (String, Double)) =>
      byKey.compare((-x._2, x._1), (-y._2, y._1))
  }

  /** Seed vocabulary: the [[MaxSeeds]] highest-frequency substrings of
    * length 2..[[SeedMaxLen]] (freq-weighted, ties lexicographic) plus
    * EVERY single character (required for coverage, never pruned). One
    * distributed explode+count over the word table; the cap is what
    * makes the collected seed table a legitimate driver-sized model. */
  private[operators] def seedPieces(words: DataFrame): (Array[String], Array[String]) = {
    // full windows only: substr past the end yields a shorter piece
    // that would double-count the suffix, so each length guards its
    // own start range (and the size<l guard avoids Spark's DESCENDING
    // sequence(1, 0))
    val subs = words.select(col("freq"), explode(expr(
      s"""flatten(transform(sequence(2, $SeedMaxLen), l ->
         |  case when char_length(word) >= l
         |    then transform(sequence(1, char_length(word) - l + 1),
         |      i -> substr(word, i, l))
         |    else array() end))""".stripMargin)).as("p"))
      .groupBy(col("p")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("p"))
      .limit(MaxSeeds)
      .collect().map(_.getString(0))
    val chars = words.select(explode(split(col("word"), "")).as("ch"))
      .filter(length(col("ch")) >= 1)
      .distinct().collect().map(_.getString(0))
    (chars.sorted, subs)
  }

  /** Forward-backward expected piece counts for one word under the
    * current model — the E step's per-word lattice (Kudo §3.2).
    * Returns (piece → expected count · freq) contributions. */
  private[operators] def expectedCounts(word: String, freq: Long,
      logp: collection.Map[String, Double],
      maxLen: Int): Iterator[(String, Double)] = {
    val s = codePoints(word)
    val n = s.length
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-(math.abs(a - b)))) }
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val piece = s.slice(i, j).mkString
        logp.get(piece).foreach { lp =>
          if (alpha(i) != NegInf) alpha(j) = lse(alpha(j), alpha(i) + lp)
        }
        i += 1
      }
      j += 1
    }
    val z = alpha(n)
    if (z == NegInf) return Iterator.empty // un-coverable word (can't happen with char seeds)
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      var k = math.min(n, i + maxLen)
      while (k > i) {
        val piece = s.slice(i, k).mkString
        logp.get(piece).foreach { lp =>
          if (beta(k) != NegInf) beta(i) = lse(beta(i), lp + beta(k))
        }
        k -= 1
      }
      i -= 1
    }
    val out = scala.collection.mutable.HashMap[String, Double]()
    i = 0
    while (i < n) {
      var k = math.min(n, i + maxLen)
      while (k > i) {
        val piece = s.slice(i, k).mkString
        logp.get(piece).foreach { lp =>
          if (alpha(i) != NegInf && beta(k) != NegInf) {
            val post = math.exp(alpha(i) + lp + beta(k) - z) * freq
            if (post > 0.0) out(piece) = out.getOrElse(piece, 0.0) + post
          }
        }
        k -= 1
      }
      i += 1
    }
    out.iterator
  }

  /** Viterbi-best segmentation under the model (ties: fewer pieces,
    * then lexicographically earlier first piece) — shared by encoding,
    * pruning's alt-loss, and the spec's reference checks. */
  private[operators] def viterbi(word: String,
      logp: collection.Map[String, Double], maxLen: Int): Option[Seq[String]] = {
    val s = codePoints(word)
    val n = s.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bestN = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0; bestN(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        val piece = s.slice(i, j).mkString
        logp.get(piece).foreach { lp =>
          if (best(i) != Double.NegativeInfinity) {
            val cand = best(i) + lp
            val candN = bestN(i) + 1
            // strict improvement, or an equal-prob path with fewer
            // pieces; earlier i (longer final piece, lexicographically
            // settled by the scan order) wins remaining ties
            if (cand > best(j) || (cand == best(j) && candN < bestN(j))) {
              best(j) = cand; bestN(j) = candN; back(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    if (best(n) == Double.NegativeInfinity) None
    else {
      val pieces = scala.collection.mutable.ListBuffer[String]()
      var at = n
      while (at > 0) { pieces.prepend(s.slice(back(at), at).mkString); at = back(at) }
      Some(pieces.toList)
    }
  }

  /** One EM round over the word table: expected counts distributed via
    * mapPartitions (model broadcast), normalized to new log-probs on
    * the driver (model-sized). */
  private def emStep(s: SparkSession, words: DataFrame,
      pieces: Map[String, Double]): Map[String, Double] = {
    import s.implicits._
    val bc = s.sparkContext.broadcast(pieces)
    val counts = words.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val lp = bc.value
        it.flatMap { case (w, f) => expectedCounts(w, f, lp, SeedMaxLen) }
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect().toMap
    val total = counts.values.sum
    pieces.keys.map { p =>
      val c = counts.getOrElse(p, 0.0)
      p -> math.log(math.max(c / total, ProbFloor))
    }.toMap
  }

  /** Train the unigram model: seed → (EM ×k → prune) until the target
    * size → final EM. Single characters are never pruned. Pruning
    * drops the pieces with the smallest likelihood loss
    * `count · (logp − altLogp)` (SentencePiece's approximation), where
    * altLogp is the piece's own Viterbi segmentation by the REMAINING
    * pieces — driver-side over the model-sized table. */
  def trainUnigram(d: DataFrame, targetVocab: Int = TargetVocab): Map[String, Double] = {
    val s = d.sparkSession
    val words = wordFreq(d)
    val (chars, seeds) = seedPieces(words)
    val charSet = chars.toSet
    val init = (chars ++ seeds.filterNot(charSet)).distinct
    var model: Map[String, Double] =
      init.map(p => p -> math.log(1.0 / init.length)).toMap
    // single characters are never pruned, so a corpus whose alphabet
    // alone meets the target can't shrink below it — the effective
    // target is the ceiling the loop CAN reach (SentencePiece errors
    // out here; we keep the full alphabet, which is the usable model)
    val effTarget = math.max(targetVocab, chars.length)
    var iter = 0
    while (model.size > effTarget && model.size > chars.length) {
      require(iter < 50, "unigram prune loop failed to converge")
      (1 to EmRoundsPerPrune).foreach(_ => model = emStep(s, words, model))
      // prune: loss per non-char piece via its alternative segmentation
      val multi = model.keys.filterNot(charSet).toSeq
      val losses = multi.map { p =>
        val without = model - p
        val alt = viterbi(p, without, SeedMaxLen)
          .map(_.map(without).sum).getOrElse(Double.NegativeInfinity)
        // expected-count weight folded into logp by EM normalization:
        // exp(logp) is the piece's posterior mass share
        p -> (math.exp(model(p)) * (model(p) - alt))
      }
      val keepN = math.max(effTarget - chars.length,
        (multi.size * PruneKeep).toInt)
      val ordered = losses.sorted(lossOrdering)
      val kept = ordered.take(math.min(keepN, multi.size)).map(_._1).toSet
      if (kept.size == multi.size) {
        // nothing pruned (already at the floor): trim hard to target
        val hard = ordered.take(math.max(0, effTarget - chars.length))
          .map(_._1).toSet
        model = model.filter { case (p, _) => charSet(p) || hard(p) }
      } else model = model.filter { case (p, _) => charSet(p) || kept(p) }
      iter += 1
    }
    (1 to EmRoundsPerPrune).foreach(_ => model = emStep(s, words, model))
    model
  }

  /** q110: the trained unigram vocabulary (piece, logp, is_char). No
    * DuckDB oracle (EM + pruning are iterative); UnigramOpsSpec proves
    * the model against an independent reference implementation and the
    * distribution's normalization, the q104 convention. */
  val q110UnigramVocab: QueryDef = QueryDef(
    "q110_unigram_vocab",
    (s, dir) => {
      val model = trainUnigram(Tables.loadParallel(s, dir, "documents"))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        model.toSeq.sortBy(_._1).map { case (p, lp) =>
          Row(p, math.rint(lp * 1e6) / 1e6, codePoints(p).length == 1)
        }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("piece",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("logp",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("is_char",
            org.apache.spark.sql.types.BooleanType, nullable = false))))
        .orderBy(col("piece"))
    },
    None)

  /** q111: Viterbi-encode the corpus with the trained model — each
    * DISTINCT word segmented once (mapPartitions, model broadcast),
    * segmentation joined back onto the word stream, per-doc counts
    * (q105's output shape, enabling a direct BPE-vs-unigram
    * compression comparison). */
  val q111UnigramEncode: QueryDef = QueryDef(
    "q111_unigram_encode",
    (s, dir) => {
      import s.implicits._
      val d = Tables.loadParallel(s, dir, "documents")
      val model = trainUnigram(d)
      val bc = s.sparkContext.broadcast(model)
      val vocabSeg = wordFreq(d).select(col("word")).as[String]
        .mapPartitions { it =>
          val lp = bc.value
          it.map(w => (w, viterbi(w, lp, SeedMaxLen).map(_.length).getOrElse(-1)))
        }.toDF("word", "n_pieces")
      LmOps.tokenizedOf(d)
        .select(col("doc_id"), explode(col("w")).as("word"))
        .filter(length(col("word")) >= 1)
        .join(vocabSeg, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(length(col("word"))).as("n_chars"),
          sum(col("n_pieces")).as("n_unigram_tokens"),
          count(lit(1)).as("n_words"))
        .withColumn("compression",
          round(col("n_chars").cast("double") / col("n_unigram_tokens"), 6))
        .orderBy(col("doc_id"))
    },
    None)

  val all: Seq[QueryDef] = Seq(q110UnigramVocab, q111UnigramEncode)
}

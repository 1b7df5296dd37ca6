package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer proven against an independent driver-side
  * reference implementation of the exact-replay schedule (Kudo 2018's
  * algorithm with probability-space lattices, quantized expected
  * counts, and the fixed prune-round schedule) on the real corpus —
  * plain Scala maps and loops, no Spark, independent of the
  * operator's mapPartitions/broadcast machinery. The DuckDB oracle
  * separately replays the same trajectory (the correctness gate);
  * this spec pins the DISTRIBUTED implementation against a scalar
  * one, so a partitioning/broadcast bug cannot hide behind a
  * matching-but-equally-wrong oracle. */
class UnigramOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def cps(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private val cpOrdering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compare(a.codePoints().toArray, b.codePoints().toArray)

  /** Reference trainer: seed → 24 × (EM ×2 → prune) → EM ×2, all in
    * probability space with per-occurrence integer quantization. */
  private def referenceUnigram(wordFreq: Map[String, Long]): Map[String, Double] = {
    val maxLen = 4; val maxSeeds = 400; val target = 80
    val keepRatio = 0.8; val floor = 1e-12; val rounds = 24

    val subCounts = scala.collection.mutable.Map[String, Long]()
    wordFreq.foreach { case (w, f) =>
      val s = cps(w)
      for (l <- 2 to maxLen; i <- 0 to s.length - l) {
        val p = s.slice(i, i + l).mkString
        subCounts(p) = subCounts.getOrElse(p, 0L) + f
      }
    }
    val seeds = subCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Long, cpOrdering))
      .take(maxSeeds).map(_._1)
    val chars = wordFreq.keys.flatMap(cps).toSeq.distinct
    val charSet = chars.toSet
    val init = (chars ++ seeds.filterNot(charSet)).distinct

    def em(model: Map[String, Double]): Map[String, Double] = {
      val counts = scala.collection.mutable.Map[String, Long]()
      wordFreq.foreach { case (w, f) =>
        val s = cps(w); val n = s.length
        val alpha = new Array[Double](n + 1); alpha(0) = 1.0
        for (j <- 1 to n) {
          var acc = 0.0
          for (l <- 1 to maxLen) {
            val i = j - l
            acc += (if (i >= 0) alpha(i) * model.getOrElse(s.slice(i, j).mkString, 0.0) else 0.0)
          }
          alpha(j) = acc
        }
        val z = alpha(n)
        if (z > 0.0) {
          val beta = new Array[Double](n + 1); beta(n) = 1.0
          for (i <- n - 1 to 0 by -1) {
            var acc = 0.0
            for (l <- 1 to maxLen) {
              val k = i + l
              acc += (if (k <= n) model.getOrElse(s.slice(i, k).mkString, 0.0) * beta(k) else 0.0)
            }
            beta(i) = acc
          }
          for (i <- 0 until n; l <- 1 to maxLen if i + l <= n) {
            val k = i + l
            val piece = s.slice(i, k).mkString
            model.get(piece).foreach { pp =>
              val q = math.floor(((((alpha(i) * pp) * beta(k)) / z) * f) * 1e6 + 0.5).toLong
              if (q != 0L) counts(piece) = counts.getOrElse(piece, 0L) + q
            }
          }
        }
      }
      val total = counts.values.sum
      model.keys.map { p =>
        p -> math.max(counts.getOrElse(p, 0L).toDouble / total.toDouble, floor)
      }.toMap
    }

    def altProb(piece: String, model: Map[String, Double]): Double = {
      val s = cps(piece); val n = s.length
      val best = Array.fill[Double](n + 1)(-1.0); best(0) = 1.0
      for (j <- 1 to n; l <- 1 to math.min(maxLen, j)) {
        val i = j - l
        if (!(i == 0 && j == n) && best(i) >= 0.0)
          model.get(s.slice(i, j).mkString).foreach { pp =>
            val cand = best(i) * pp
            if (cand > best(j)) best(j) = cand
          }
      }
      best(n)
    }

    var model: Map[String, Double] = init.map(p => p -> 1.0 / init.length).toMap
    val effTarget = math.max(target, chars.length)
    (1 to rounds).foreach { _ =>
      (1 to 2).foreach(_ => model = em(model))
      val multi = model.keys.filterNot(charSet).toSeq
      val losses = multi.map { p =>
        p -> (model(p) * math.log(model(p) / altProb(p, model)))
      }
      val keepN = math.max(effTarget - chars.length, (multi.size * keepRatio).toInt)
      val ordered = losses.sortBy { case (p, l) => (-l, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, cpOrdering))
      val kept =
        if (keepN >= multi.size)
          ordered.take(math.max(0, effTarget - chars.length)).map(_._1).toSet
        else ordered.take(keepN).map(_._1).toSet
      model = model.filter { case (p, _) => charSet(p) || kept(p) }
    }
    (1 to 2).foreach(_ => model = em(model))
    model
  }

  private def corpusWordFreq: Map[String, Long] =
    graft.Tables.load(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("q110 vocabulary matches the independent reference trainer") {
    val got = UnigramOps.q110UnigramVocab.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = referenceUnigram(corpusWordFreq)
      .map { case (p, prob) => p -> math.log(prob) }
    assert(got.keySet === want.keySet,
      s"piece sets diverge: op-only=${(got.keySet -- want.keySet).take(5)}, " +
        s"ref-only=${(want.keySet -- got.keySet).take(5)}")
    val drift = want.collect {
      case (p, lp) if math.abs(got(p) - lp) > 1e-6 => (p, lp, got(p))
    }
    assert(drift.isEmpty, s"logp drift beyond 1e-6: ${drift.take(3)}")
  }

  test("q110 model is a distribution with full character coverage at the target size") {
    val rows = UnigramOps.q110UnigramVocab.fn(spark, dir).collect()
    assert(rows.length <= 80)
    val mass = rows.map(r => math.exp(r.getDouble(1))).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"piece probabilities sum to $mass")
    val chars = rows.filter(_.getBoolean(2)).map(_.getString(0)).toSet
    val needed = corpusWordFreq.keys.flatMap(cps).toSet
    assert(needed.subsetOf(chars), "a corpus character is missing from the vocab")
  }

  test("an alphabet at or beyond the target vocab converges to the character model") {
    // 100 distinct CJK code points: chars alone exceed the default
    // target of 80, so the prune schedule can only strip multi-char
    // pieces and must settle at the bare alphabet (the fixed 24-round
    // schedule drains any ≤400-seed set: keepN = floor(0.8·multi)
    // reaches 0 within 23 rounds)
    val sp = spark
    import sp.implicits._
    val alphabet = (0 until 100).map(i => new String(Character.toChars(0x4E00 + i)))
    val texts = alphabet.grouped(4).map(_.mkString).toSeq
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = UnigramOps.trainUnigram(d, targetVocab = 80)
    assert(alphabet.toSet.subsetOf(model.keySet), "alphabet coverage lost")
    assert(model.size === alphabet.length,
      s"expected the bare alphabet, got ${model.size} pieces")
  }

  test("q111 per-doc token counts match a reference Viterbi under the trained model") {
    val model = UnigramOps.q110UnigramVocab.fn(spark, dir).collect()
      .map(r => r.getString(0) -> math.exp(r.getDouble(1))).toMap
    // reference Viterbi in prob space: strictly-greater product, or an
    // equal positive product with fewer pieces
    def vit(word: String): Int = {
      val s = cps(word); val n = s.length
      val best = new Array[Double](n + 1); best(0) = 1.0
      val bestN = new Array[Int](n + 1)
      for (j <- 1 to n) {
        var cp = 0.0; var cc = 0
        for (l <- math.min(4, j) to 1 by -1) {
          val i = j - l
          val cand = best(i) * model.getOrElse(s.slice(i, j).mkString, 0.0)
          val cn = bestN(i) + 1
          if (cand > cp || (cand == cp && cand > 0.0 && cn < cc)) { cp = cand; cc = cn }
        }
        best(j) = cp; bestN(j) = cc
      }
      bestN(n)
    }
    val want = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase(java.util.Locale.ROOT)
          .trim.split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> toks.map(vit).sum.toLong
      }.filter(_._2 > 0).toMap
    val rows = UnigramOps.q111UnigramEncode.fn(spark, dir).collect()
    val got = rows.map(r =>
      r.getLong(0) -> r.getLong(r.fieldIndex("n_unigram_tokens"))).toMap
    assert(got.keySet === want.keySet)
    val diffs = want.collect { case (id, n) if got(id) != n => (id, n, got(id)) }
    assert(diffs.isEmpty, s"encoder diverges on ${diffs.take(3)}")
    // a learned model compresses below the character baseline: rounding
    // q110's logp to 6 decimals cannot flip Viterbi counts here because
    // path-score gaps on this corpus are far above the rounding error
    val (chars, pieces) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(pieces < chars, s"no compression: $pieces tokens vs $chars chars")
  }
}

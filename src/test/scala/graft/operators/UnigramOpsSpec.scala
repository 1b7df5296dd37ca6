package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer proven against an independent driver-side
  * reference implementation of Kudo 2018's algorithm on the real
  * corpus — the no-oracle correctness convention (q104/q105). */
class UnigramOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def cps(w: String): Vector[String] =
    w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  private val cpOrdering: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compare(a.codePoints().toArray, b.codePoints().toArray)

  /** Reference unigram trainer: plain Scala maps and loops, mirroring
    * the published procedure (seed -> EM x2 -> prune -> ... -> EM x2)
    * independently of the operator's Column/mapPartitions code. */
  private def referenceUnigram(wordFreq: Map[String, Long]): Map[String, Double] = {
    val maxLen = 4; val maxSeeds = 400; val target = 80
    val keepRatio = 0.8; val floor = 1e-12
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }

    // seed: full 2..maxLen substrings by weighted frequency + all chars
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
      val counts = scala.collection.mutable.Map[String, Double]()
      wordFreq.foreach { case (w, f) =>
        val s = cps(w); val n = s.length
        val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
        for (j <- 1 to n; i <- math.max(0, j - maxLen) until j)
          model.get(s.slice(i, j).mkString).foreach { lp =>
            if (alpha(i) != NegInf) alpha(j) = lse(alpha(j), alpha(i) + lp)
          }
        val z = alpha(n)
        if (z != NegInf) {
          val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
          for (i <- n - 1 to 0 by -1; k <- math.min(n, i + maxLen) until i by -1)
            model.get(s.slice(i, k).mkString).foreach { lp =>
              if (beta(k) != NegInf) beta(i) = lse(beta(i), lp + beta(k))
            }
          for (i <- 0 until n; k <- math.min(n, i + maxLen) until i by -1)
            model.get(s.slice(i, k).mkString).foreach { lp =>
              if (alpha(i) != NegInf && beta(k) != NegInf) {
                val post = math.exp(alpha(i) + lp + beta(k) - z) * f
                if (post > 0.0) {
                  val p = s.slice(i, k).mkString
                  counts(p) = counts.getOrElse(p, 0.0) + post
                }
              }
            }
        }
      }
      val total = counts.values.sum
      model.keys.map { p =>
        p -> math.log(math.max(counts.getOrElse(p, 0.0) / total, floor))
      }.toMap
    }

    def viterbiLogp(word: String, model: Map[String, Double]): Double = {
      val s = cps(word); val n = s.length
      val best = Array.fill(n + 1)(NegInf); best(0) = 0.0
      for (j <- 1 to n; i <- math.max(0, j - maxLen) until j)
        model.get(s.slice(i, j).mkString).foreach { lp =>
          if (best(i) != NegInf && best(i) + lp > best(j)) best(j) = best(i) + lp
        }
      best(n)
    }

    var model: Map[String, Double] =
      init.map(p => p -> math.log(1.0 / init.length)).toMap
    var iter = 0
    while (model.size > target) {
      require(iter < 50)
      (1 to 2).foreach(_ => model = em(model))
      val multi = model.keys.filterNot(charSet).toSeq
      val losses = multi.map { p =>
        val alt = viterbiLogp(p, model - p)
        p -> (math.exp(model(p)) * (model(p) - alt))
      }
      val keepN = math.max(target - chars.length, (multi.size * keepRatio).toInt)
      val ordered = losses.sortBy { case (p, l) => (-l, p) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, cpOrdering))
      val kept = ordered.take(math.min(keepN, multi.size)).map(_._1).toSet
      if (kept.size == multi.size) {
        val hard = ordered.take(math.max(0, target - chars.length)).map(_._1).toSet
        model = model.filter { case (p, _) => charSet(p) || hard(p) }
      } else model = model.filter { case (p, _) => charSet(p) || kept(p) }
      iter += 1
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
    // target of 80, so the prune loop can only strip multi-char
    // pieces and must stop at the alphabet instead of spinning to the
    // iteration guard (the r7 divergence)
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
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def vit(word: String): Int = {
      val s = cps(word); val n = s.length
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val bestN = Array.fill(n + 1)(Int.MaxValue)
      best(0) = 0.0; bestN(0) = 0
      for (j <- 1 to n; i <- math.max(0, j - 4) until j)
        model.get(s.slice(i, j).mkString).foreach { lp =>
          if (best(i) != Double.NegativeInfinity) {
            val cand = best(i) + lp; val candN = bestN(i) + 1
            if (cand > best(j) || (cand == best(j) && candN < bestN(j))) {
              best(j) = cand; bestN(j) = candN
            }
          }
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

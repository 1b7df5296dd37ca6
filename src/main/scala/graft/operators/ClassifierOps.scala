package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-classifier operators — the "model-based quality filtering"
  * stage of a pretraining pipeline (GPT-3 §A / PaLM / Llama train a
  * classifier with a curated corpus as positives and the raw crawl as
  * negatives, then keep crawl docs the classifier scores high; fastText
  * supervised and NBSVM are the standard cheap architectures). The
  * engine's variant is a multinomial Naive-Bayes log-odds scorer —
  * CLOSED-FORM training (two grouped counts + add-one smoothing), so
  * the whole train+score pass is deterministic, one-shot, and exactly
  * reproducible in the DuckDB oracle, unlike an SGD fastText whose
  * result depends on update order.
  *
  * Train: w(t) = ln((c_pos(t)+1)/(N_pos+V)) − ln((c_neg(t)+1)/(N_neg+V))
  * over the seed labeling; score(doc) = mean over its tokens of w(t)
  * (length-normalized log-likelihood ratio — the per-token normalization
  * is what makes the threshold length-independent, the same reason
  * CCNet thresholds per-token perplexity).
  *
  * Scale: training is ONE (token)-keyed grouped count — vocab-sized
  * output, Heaps-law sublinear in the corpus — plus a 1-row total;
  * the weight table broadcasts forever. Scoring is q96's narrow shape:
  * explode → broadcast hash join → groupBy(doc_id) with partial
  * aggregation. The corpus is scanned twice (train, score) and never
  * self-joined; nothing shuffles but vocab-sized counts and
  * (doc_id, double) partials.
  */
object ClassifierOps {

  /** The curated-seed sources standing in for the reference corpus
    * (WebText/Wikipedia in the published recipes). */
  private val SeedSources = Seq("src0", "src1", "src2")

  /** Library entry: per-doc NB log-odds quality scores over any
    * (doc_id, source, text) frame — (doc_id, n_toks, quality_lr).
    * The q170 train+score pass, reusable by `Curation.run`'s
    * token-classifier stage. */
  def nbQualityOf(d: DataFrame, seeds: Seq[String]): DataFrame = {
    val toks = d
      .select(col("doc_id"),
        col("source").isin(seeds: _*).as("pos"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
    val counts = toks.groupBy(col("tok")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val tot = counts.agg(
      sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"),
      count(lit(1)).as("v"))
    val w = counts.crossJoin(broadcast(tot)).select(col("tok"),
      (log((col("cpos") + lit(1.0)) / (col("npos") + col("v")).cast("double")) -
        log((col("cneg") + lit(1.0)) / (col("nneg") + col("v")).cast("double")))
        .as("w"))
    toks.join(broadcast(w), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        round(avg(col("w")), 6).as("quality_lr"))
  }

  /** The NB train/score pass as shared oracle CTE text, ending in
    * `nbscore(doc_id, n_toks, quality_lr)` — one copy of the smoothing
    * formula and the seed-source list, used verbatim by the q170,
    * q177, and q188 oracles so the three cannot drift (the
    * ClusterOps.lloydSqlCtes / LmOps.nllSqlCtes convention). */
  private val nbSqlCtes =
    """toks AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |counts AS (SELECT tok,
      |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
      |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cneg
      |  FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(cpos) AS BIGINT) AS npos,
      |    CAST(sum(cneg) AS BIGINT) AS nneg,
      |    CAST(count(*) AS BIGINT) AS v FROM counts),
      |w AS (SELECT tok,
      |    ln((cpos + 1.0) / CAST(npos + v AS DOUBLE)) -
      |    ln((cneg + 1.0) / CAST(nneg + v AS DOUBLE)) AS w
      |  FROM counts, tot),
      |nbscore AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
      |    round(avg(w.w), 6) AS quality_lr
      |  FROM toks t JOIN w USING (tok) GROUP BY t.doc_id)""".stripMargin

  /** q170: NB log-odds quality scoring — train on the seed labeling,
    * score every document, flag the keep decision at threshold 0. */
  val q170NbQuality: QueryDef = QueryDef(
    "q170_nb_quality",
    (s, dir) => {
      nbQualityOf(Tables.loadParallel(s, dir, "documents"), SeedSources)
        .withColumn("keep", round(col("quality_lr"), 6) > 0.0)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $nbSqlCtes
      SELECT doc_id, n_toks, quality_lr, quality_lr > 0.0 AS keep
      FROM nbscore ORDER BY doc_id"""),
    headline = true)

  /** q177: Pareto-thresholded classifier resampling — the EXACT
    * document-selection rule GPT-3 published (Brown et al. 2020,
    * Appendix A): a crawl document is kept iff
    * `pareto_draw(alpha = 9) > 1 − score`, so high-scoring documents
    * almost always survive while low scorers keep a heavy-tailed
    * chance — the deliberate diversity tail a hard threshold destroys.
    *
    * Deterministic replay: the Pareto draw comes from the doc-id hash
    * bucket via the inverse CDF, x = (1−u)^(−1/α) − 1 with
    * u = (bucket + 0.5)/2^16 (the +0.5 keeps u strictly inside (0,1)),
    * and the score is the NB POSTERIOR — the logistic of the document's
    * TOTAL log-odds (mean × token count), matching the fastText-style
    * per-document probability the published rule thresholds (the
    * per-token mean would compress every score toward ½ and blunt the
    * rule). Saturation to exactly 0/1 for extreme documents is
    * IEEE-identical on both engines. The keep comparison is on raw
    * doubles (the q97 ranking precedent: a flip needs the two sides
    * within an ulp).
    *
    * Scale: adds ONE narrow projection to q170's scoring pass — the
    * draw is hash arithmetic, the rule a scalar compare; nothing new
    * shuffles. */
  val q177ParetoResample: QueryDef = QueryDef(
    "q177_pareto_resample",
    (s, dir) => {
      val scored = nbQualityOf(Tables.loadParallel(s, dir, "documents"),
        SeedSources)
      scored
        .withColumn("score",
          expr("1.0 / (1.0 + exp(-(quality_lr * n_toks)))"))
        .withColumn("u", expr(
          s"(cast(${MixOps.bucketExpr("sha2(cast(doc_id as string), 256)", 65536)} as double) + 0.5) / 65536.0"))
        // cast the exponent explicitly: Spark parses -1.0/9.0 as a
        // scale-6 DECIMAL division (-0.111111), not the IEEE double
        .withColumn("draw",
          expr("power(1.0 - u, cast(-1.0 as double) / 9.0) - 1.0"))
        .select(col("doc_id"), round(col("score"), 6).as("score"),
          round(col("draw"), 6).as("draw"),
          (col("draw") > lit(1.0) - col("score")).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $nbSqlCtes,
      drawn AS (SELECT doc_id,
          1.0 / (1.0 + exp(-(quality_lr * n_toks))) AS score,
          power(1.0 - ((CAST(${MixOps.bucketExpr("sha256(CAST(doc_id AS VARCHAR))", 65536)} AS DOUBLE) + 0.5) / 65536.0),
            CAST(-1.0 AS DOUBLE) / 9.0) - 1.0 AS draw
        FROM nbscore)
      SELECT doc_id, round(score, 6) AS score, round(draw, 6) AS draw,
        draw > 1.0 - score AS kept
      FROM drawn ORDER BY doc_id"""),
    headline = false)

  /** q188: quality-signal agreement audit — the joint read of the two
    * independent quality signals the pipeline computes (q96 LM NLL,
    * q170 NB log-odds): Pearson correlation plus a 3×3 tercile
    * contingency table. RedPajama-v2 ships exactly this kind of
    * signal-correlation analysis: two gates that agree are redundant
    * (drop one, save a pass); two that disagree are measuring
    * different failure modes (keep both); a POSITIVE NLL/quality
    * correlation would mean one signal is miscalibrated, since high
    * perplexity should predict LOW quality.
    *
    * Determinism: both per-doc signals are already rounded at 6;
    * tercile cut points are the rounded exact percentiles (q102's
    * convention); the correlation's sums are the only free floats,
    * rounded at 4.
    *
    * Scale: two existing per-doc score tables (each the output of a
    * broadcast-model pass) joined on doc_id — one slim shuffle; the
    * contingency table is 9 rows, the correlation a 1-row epilogue
    * broadcast onto it. */
  val q188SignalAgreement: QueryDef = QueryDef(
    "q188_signal_agreement",
    (s, dir) => {
      val d = Tables.loadParallel(s, dir, "documents")
      val nll = graft.operators.LmOps.avgNllOf(d)
        .select(col("doc_id"), col("avg_nll"))
      val nb = nbQualityOf(d, SeedSources)
        .select(col("doc_id"), col("quality_lr"))
      val joined = nll.join(nb, Seq("doc_id"))
      val cuts = joined.agg(
        round(expr("percentile(avg_nll, 1.0D/3)"), 6).as("p1"),
        round(expr("percentile(avg_nll, 2.0D/3)"), 6).as("p2"),
        round(expr("percentile(quality_lr, 1.0D/3)"), 6).as("q1"),
        round(expr("percentile(quality_lr, 2.0D/3)"), 6).as("q2"))
      val corr = joined.agg(
          count(lit(1)).cast("double").as("m"),
          sum(col("avg_nll")).as("sx"), sum(col("quality_lr")).as("sy"),
          sum(col("avg_nll") * col("quality_lr")).as("sxy"),
          sum(col("avg_nll") * col("avg_nll")).as("sxx"),
          sum(col("quality_lr") * col("quality_lr")).as("syy"))
        .select(round(
          (col("sxy") - col("sx") * col("sy") / col("m")) /
            sqrt((col("sxx") - col("sx") * col("sx") / col("m")) *
              (col("syy") - col("sy") * col("sy") / col("m"))), 4)
          .as("pearson_r"))
      joined.crossJoin(broadcast(cuts))
        .select(
          when(col("avg_nll") <= col("p1"), 0L)
            .when(col("avg_nll") <= col("p2"), 1L).otherwise(2L).as("nll_bin"),
          when(col("quality_lr") <= col("q1"), 0L)
            .when(col("quality_lr") <= col("q2"), 1L).otherwise(2L).as("nb_bin"))
        .groupBy(col("nll_bin"), col("nb_bin"))
        .agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(corr))
        .orderBy(col("nll_bin"), col("nb_bin"))
    },
    Some(s"""WITH $nbSqlCtes,
      nb AS (SELECT doc_id, quality_lr FROM nbscore),
      tok2 AS (SELECT doc_id,
          regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
      bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM tok2, unnest(range(1, len(w))) AS t(i) WHERE len(w) >= 2),
      v2 AS (SELECT count(DISTINCT w2) AS v FROM bg),
      c1t AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      c2t AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      nll AS (SELECT bg.doc_id,
          round(avg(-ln((c2t.c2 + 0.1) / (c1t.c1 + 0.1 * v2.v))), 6) AS avg_nll
        FROM bg JOIN c2t ON bg.w1 = c2t.w1 AND bg.w2 = c2t.w2
          JOIN c1t ON bg.w1 = c1t.w1, v2
        GROUP BY bg.doc_id),
      j AS (SELECT n.doc_id, n.avg_nll, b.quality_lr
        FROM nll n JOIN nb b USING (doc_id)),
      cuts AS (SELECT round(quantile_cont(avg_nll, 1.0/3), 6) AS p1,
          round(quantile_cont(avg_nll, 2.0/3), 6) AS p2,
          round(quantile_cont(quality_lr, 1.0/3), 6) AS q1,
          round(quantile_cont(quality_lr, 2.0/3), 6) AS q2 FROM j),
      corr AS (SELECT round(
          (sxy - sx * sy / m) / sqrt((sxx - sx * sx / m) * (syy - sy * sy / m)), 4)
          AS pearson_r FROM (
            SELECT CAST(count(*) AS DOUBLE) AS m, sum(avg_nll) AS sx,
              sum(quality_lr) AS sy, sum(avg_nll * quality_lr) AS sxy,
              sum(avg_nll * avg_nll) AS sxx,
              sum(quality_lr * quality_lr) AS syy FROM j) a)
      SELECT CAST(CASE WHEN avg_nll <= p1 THEN 0 WHEN avg_nll <= p2 THEN 1 ELSE 2 END AS BIGINT) AS nll_bin,
        CAST(CASE WHEN quality_lr <= q1 THEN 0 WHEN quality_lr <= q2 THEN 1 ELSE 2 END AS BIGINT) AS nb_bin,
        CAST(count(*) AS BIGINT) AS n_docs, max(corr.pearson_r) AS pearson_r
      FROM j, cuts, corr
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    headline = false)

  val all: Seq[QueryDef] =
    Seq(q170NbQuality, q177ParetoResample, q188SignalAgreement)
}

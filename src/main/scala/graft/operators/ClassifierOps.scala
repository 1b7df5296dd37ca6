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

  /** q170: NB log-odds quality scoring — train on the seed labeling,
    * score every document, flag the keep decision at threshold 0. */
  val q170NbQuality: QueryDef = QueryDef(
    "q170_nb_quality",
    (s, dir) => {
      nbQualityOf(Tables.loadParallel(s, dir, "documents"), SeedSources)
        .withColumn("keep", round(col("quality_lr"), 6) > 0.0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id, source IN ('src0', 'src1', 'src2') AS pos,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      counts AS (SELECT tok,
          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
          CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cneg
        FROM toks GROUP BY tok),
      tot AS (SELECT CAST(sum(cpos) AS BIGINT) AS npos,
          CAST(sum(cneg) AS BIGINT) AS nneg,
          CAST(count(*) AS BIGINT) AS v FROM counts),
      w AS (SELECT tok,
          ln((cpos + 1.0) / CAST(npos + v AS DOUBLE)) -
          ln((cneg + 1.0) / CAST(nneg + v AS DOUBLE)) AS w
        FROM counts, tot)
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        round(avg(w.w), 6) AS quality_lr,
        round(avg(w.w), 6) > 0.0 AS keep
      FROM toks t JOIN w USING (tok)
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    headline = true)

  val all: Seq[QueryDef] = Seq(q170NbQuality)
}

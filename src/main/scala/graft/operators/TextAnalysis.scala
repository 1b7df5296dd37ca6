package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline tier:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure Column expressions — a narrow map stage that
  * scales linearly with documents and never shuffles content.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadParallel(s, dir, "documents")

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token counting (whitespace tokenizer). */
  val q45TokenCount: QueryDef = QueryDef(
    "q45_token_count",
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
          col("n_chars"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
      END AS n_tokens, n_chars
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: stopword ratio, mean word length, type-token
    * ratio — the cheap quality gates a pretraining pipeline applies
    * before anything expensive. */
  val q46QualityScore: QueryDef = QueryDef(
    "q46_quality_score",
    (s, dir) => {
      val tk = tokens(col("text"))
      val nTok = size(tk).cast("double")
      val nStop = size(filter(tk, w => w.isin("the", "a"))).cast("double")
      val nDistinct = size(array_distinct(tk)).cast("double")
      docs(s, dir).select(
        col("doc_id"),
        round(nStop / nTok, 6).as("stopword_ratio"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") / nTok, 6).as("mean_word_len"),
        round(nDistinct / nTok, 6).as("type_token_ratio"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      round(CAST(len(list_filter(tk, w -> w IN ('the', 'a'))) AS DOUBLE) / len(tk), 6) AS stopword_ratio,
      round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(tk), 6) AS mean_word_len,
      round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6) AS type_token_ratio
      FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS tk
        FROM documents) x ORDER BY doc_id"""))

  /** Language-ID: marker-word n-gram heuristic with a deterministic
    * priority tie-break (real pipelines use fastText; the operator shape
    * — classify + groupBy distribution — is identical). */
  val q47LangId: QueryDef = QueryDef(
    "q47_lang_id",
    (s, dir) => {
      val tk = tokens(col("text"))
      def cnt(w: String): Column = size(filter(tk, t => t === w)).cast("long")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          cnt("the").as("c_the"), cnt("data").as("c_data"), cnt("spark").as("c_spark"))
        .withColumn("lang_pred",
          when(col("c_the") === 0 && col("c_data") === 0 && col("c_spark") === 0, "und")
            .when(col("c_the") >= col("c_data") && col("c_the") >= col("c_spark"), "en")
            .when(col("c_data") >= col("c_spark"), "dat")
            .otherwise("spk"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("lang_pred"))
    },
    Some("""SELECT lang, lang_pred, count(*) AS n_docs FROM (
      SELECT lang, CASE
        WHEN c_the = 0 AND c_data = 0 AND c_spark = 0 THEN 'und'
        WHEN c_the >= c_data AND c_the >= c_spark THEN 'en'
        WHEN c_data >= c_spark THEN 'dat'
        ELSE 'spk' END AS lang_pred FROM (
          SELECT lang,
            CAST(len(list_filter(tk, t -> t = 'the')) AS BIGINT) AS c_the,
            CAST(len(list_filter(tk, t -> t = 'data')) AS BIGINT) AS c_data,
            CAST(len(list_filter(tk, t -> t = 'spark')) AS BIGINT) AS c_spark
          FROM (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS tk
            FROM documents) t) c) x
      GROUP BY lang, lang_pred ORDER BY lang, lang_pred"""))

  /** Document fingerprinting: winnowing-style — minimum hash over all
    * 8-char shingles (stride 4), i.e. a locality-robust content id. */
  val q48Fingerprint: QueryDef = QueryDef(
    "q48_fingerprint",
    (s, dir) =>
      docs(s, dir)
        .withColumn("pos", explode(sequence(lit(0L),
          greatest(ceil((col("n_chars").cast("double") - lit(8.0)) / lit(4.0)).cast("long"), lit(0L)))))
        .withColumn("shingle", expr("substring(text, cast(pos * 4 + 1 as int), 8)"))
        .groupBy(col("doc_id"))
        .agg(min(sha2(col("shingle"), 256)).as("fingerprint"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, min(sha256(shingle)) AS fingerprint FROM (
      SELECT doc_id, substr(text, CAST(pos * 4 + 1 AS INT), 8) AS shingle FROM (
        SELECT doc_id, text, unnest(generate_series(0,
          greatest(CAST(ceil((n_chars - 8.0) / 4.0) AS BIGINT), 0))) AS pos
        FROM documents) p) s
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Same durable-staging materialization seam as DedupOps/MixOps/LmOps
    * — needed here because the winnowing windows reference the gram
    * array per element (the project-collapse inlining hazard). */
  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Staging.materialize(df, tag, "spark.graft.corpus.stagingDir")

  private val WinK = 3 // tokens per gram
  private val WinW = 4 // gram hashes per winnowing window

  /** Winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme):
    * hash every [[WinK]]-token gram, slide a window of [[WinW]]
    * consecutive hashes, keep each window's minimum — the selected set
    * GUARANTEES any shared run of WinW+WinK-1 tokens between two docs
    * shares a fingerprint, at ~2/(WinW+1) the density of q98's
    * every-window spans. q48 is the degenerate single-fingerprint form
    * (one global min); this is the set form robust matching uses.
    *
    * Scale: both hashing and window-min selection are per-doc HOFs —
    * a narrow map with NO shuffle at all (the sort is harness
    * determinism); the gram array is materialized once per doc so the
    * window pass reads it instead of re-hashing per window. The
    * downstream fingerprint join is q98's shape (equi on the hash). */
  val q103Winnowing: QueryDef = QueryDef(
    "q103_winnowing",
    (s, dir) => {
      val grams = materialize(docs(s, dir)
        .select(col("doc_id"), tokens(col("text")).as("w"))
        .filter(size(col("w")) >= WinK)
        .select(col("doc_id"), expr(
          s"""transform(sequence(1, size(w) - ${WinK - 1}),
             |  i -> substr(sha2(concat_ws(' ', element_at(w, i),
             |    element_at(w, i + 1), element_at(w, i + 2)), 256), 1, 16))""".stripMargin)
          .as("grams")), "winnow_grams")
      grams
        .withColumn("fps", expr(
          s"""case when size(grams) >= $WinW
             | then array_distinct(transform(sequence(1, size(grams) - ${WinW - 1}),
             |   j -> array_min(slice(grams, j, $WinW))))
             | else array(array_min(grams)) end""".stripMargin))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_grams"),
          size(col("fps")).cast("long").as("n_fingerprints"),
          round(size(col("fps")).cast("double") /
            greatest(size(col("grams")) - (WinW - 1), lit(1)), 6).as("density"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tok AS (SELECT doc_id,
        regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
      g AS (SELECT doc_id,
          [substr(sha256(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 16)
           for i in range(1, len(w) - ${WinK - 2})] AS grams
        FROM tok WHERE len(w) >= $WinK),
      f AS (SELECT doc_id, len(grams) AS n_grams,
          CASE WHEN len(grams) >= $WinW
            THEN list_distinct([list_aggregate(grams[j:j+${WinW - 1}], 'min')
                                for j in range(1, len(grams) - ${WinW - 2})])
            ELSE [list_aggregate(grams, 'min')] END AS fps
        FROM g)
      SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        CAST(len(fps) AS BIGINT) AS n_fingerprints,
        round(len(fps)::DOUBLE / greatest(n_grams - ${WinW - 1}, 1), 6) AS density
      FROM f ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // q113: CCNet dedup normalization (NFC + case + digit folding)
  // ---------------------------------------------------------------

  /** The normalization CCNet applies BEFORE hashing paragraphs for
    * dedup (Wenzek et al. 2020 §4.1 / cc_net's text_normalizer —
    * lowercase, unicode normalization, digit folding), so visually
    * identical text in different unicode encodings or numberings
    * dedups together: NFC-normalize → lowercase → digits→0 → collapse
    * whitespace → trim, then the sha256 dedup key over the canonical
    * form. NFC runs as a native codegen'd expression
    * ([[graft.functions.expressions.NfcNormalize]]) so the whole
    * normalize→hash chain is one generated loop on the scan — no UDF
    * break in the hot path.
    *
    * Scale: a pure narrow projection; the dedup key feeds q22's
    * groupBy exactly as the raw hash did. */
  val q113CcnetNormalize: QueryDef = QueryDef(
    "q113_ccnet_normalize",
    (s, dir) => {
      graft.functions.expressions.TextExpressions.register(s)
      val norm = trim(regexp_replace(regexp_replace(
        lower(expr("nfc_norm(text)")), "[0-9]", "0"), "\\s+", " "))
      docs(s, dir)
        .select(col("doc_id"), norm.as("norm"))
        .select(col("doc_id"),
          sha2(col("norm"), 256).as("norm_hash"),
          length(col("norm")).cast("long").as("norm_len"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        sha256(trim(regexp_replace(regexp_replace(
          lower(nfc_normalize(text)), '[0-9]', '0', 'g'), '\s+', ' ', 'g'))) AS norm_hash,
        CAST(length(trim(regexp_replace(regexp_replace(
          lower(nfc_normalize(text)), '[0-9]', '0', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS norm_len
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // q123: fused quality-signal bundle (RedPajama-v2 shape)
  // ---------------------------------------------------------------

  /** q89's BPE-ish pre-tokenizer shape (letter runs, single digits,
    * single punctuation) — duplicated constant so the bundle's SQL
    * stays textually identical to q89's. */
  private val BpeishSignalRe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** The per-document quality-signal bundle, fused: every cheap narrow
    * signal the audit tier computes separately (q45 counts, q46
    * ratios, q82's Gopher components + verdict, q88's duplicate-bigram
    * fraction, q89's subword budget) emitted as ONE wide row per doc —
    * the RedPajama-v2 "quality signals" convention, where filters are
    * decided downstream from a signals table instead of re-scanning
    * text per rule. Signal definitions are IDENTICAL to the per-signal
    * queries (same expressions, same rounding).
    *
    * Scale: the whole bundle is ONE narrow codegen'd projection over a
    * materialized token array — N audit queries at 100 TB cost N
    * corpus scans, the bundle costs one, and the downstream filter
    * sweep (tune thresholds, re-gate, ablate) runs on the slim signals
    * table without ever touching text again. The duplicate-bigram
    * fraction uses the within-row `array_distinct` form (identical
    * value to q88's groupBy form) precisely so the bundle never
    * shuffles. */
  /** The signal bundle over an arbitrary documents frame — q123's
    * body, reused by the q126 gate sweep. */
  def qualitySignalsOf(d: DataFrame): DataFrame = {
      val toks = materialize(d
        .select(col("doc_id"), col("text"), col("n_chars"),
          tokens(col("text")).as("w")), "signals_tok")
      val nTok = size(col("w")).cast("double")
      val nWords = size(col("w")).cast("long")
      val meanLen = length(regexp_replace(trim(col("text")), "\\s+", ""))
        .cast("double") / nWords
      val nStop = size(filter(col("w"),
        t => t.isin("the", "a", "of", "to", "and"))).cast("long")
      val alphaFrac = size(filter(col("w"),
        t => t.rlike("[A-Za-z]"))).cast("double") / nWords
      val bgs = expr(
        """case when size(w) >= 2
          | then transform(sequence(1, size(w) - 1),
          |   i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))
          | else array() end""".stripMargin)
      val nBpe = size(regexp_extract_all(col("text"), lit(BpeishSignalRe), lit(0)))
        .cast("long")
      toks.select(
        col("doc_id"),
        when(length(trim(col("text"))) === 0, 0L).otherwise(nWords).as("n_tokens"),
        col("n_chars"),
        round(size(filter(col("w"), t => t.isin("the", "a"))).cast("double") / nTok, 6)
          .as("stopword_ratio"),
        round(size(array_distinct(col("w"))).cast("double") / nTok, 6)
          .as("type_token_ratio"),
        round(meanLen, 6).as("mean_word_len"),
        nStop.as("n_stopwords"),
        round(alphaFrac, 6).as("alpha_frac"),
        (nWords.between(10, 1000) && meanLen.between(2.0, 12.0) &&
          nStop >= 2 && alphaFrac >= 0.8).as("pass_gopher"),
        when(size(col("w")) < 2, lit(null).cast("double"))
          .otherwise(round(lit(1.0) -
            size(array_distinct(bgs)).cast("double") / size(bgs), 6))
          .as("dup_bigram_frac"),
        when(length(trim(col("text"))) === 0, lit(null).cast("double"))
          .otherwise(round(nBpe.cast("double") / nWords, 6)).as("tokens_per_word"))
        .orderBy(col("doc_id"))
  }

  /** q123's oracle CTE chain ending in `signals`, shared verbatim with
    * q126's oracle so the two can never drift. */
  private val signalsSqlCtes = s"""tok AS (SELECT doc_id, text, n_chars,
        regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
      bg AS (SELECT doc_id,
        CASE WHEN len(w) >= 2
          THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
          ELSE [] END AS bgs FROM tok),
      signals AS (SELECT t.doc_id,
        CASE WHEN length(trim(t.text)) = 0 THEN 0
             ELSE CAST(len(t.w) AS BIGINT) END AS n_tokens,
        t.n_chars,
        round(CAST(len(list_filter(t.w, x -> x IN ('the', 'a'))) AS DOUBLE) / len(t.w), 6)
          AS stopword_ratio,
        round(CAST(len(list_distinct(t.w)) AS DOUBLE) / len(t.w), 6)
          AS type_token_ratio,
        round(CAST(length(regexp_replace(trim(t.text), '\\s+', '', 'g')) AS DOUBLE) / len(t.w), 6)
          AS mean_word_len,
        CAST(len(list_filter(t.w, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT)
          AS n_stopwords,
        round(CAST(len(list_filter(t.w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(t.w), 6)
          AS alpha_frac,
        (CAST(len(t.w) AS BIGINT) BETWEEN 10 AND 1000
         AND CAST(length(regexp_replace(trim(t.text), '\\s+', '', 'g')) AS DOUBLE) / len(t.w) BETWEEN 2.0 AND 12.0
         AND CAST(len(list_filter(t.w, x -> x IN ('the', 'a', 'of', 'to', 'and'))) AS BIGINT) >= 2
         AND CAST(len(list_filter(t.w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(t.w) >= 0.8)
          AS pass_gopher,
        CASE WHEN len(t.w) < 2 THEN NULL
             ELSE round(1.0 - CAST(len(list_distinct(b.bgs)) AS DOUBLE) / len(b.bgs), 6) END
          AS dup_bigram_frac,
        CASE WHEN length(trim(t.text)) = 0 THEN NULL
             ELSE round(CAST(len(regexp_extract_all(t.text, '$BpeishSignalRe')) AS DOUBLE) / len(t.w), 6) END
          AS tokens_per_word
      FROM tok t JOIN bg b ON t.doc_id = b.doc_id)"""

  val q123QualitySignals: QueryDef = QueryDef(
    "q123_quality_signals",
    (s, dir) => qualitySignalsOf(docs(s, dir)),
    Some(s"""WITH $signalsSqlCtes
      SELECT * FROM signals ORDER BY doc_id"""),
    headline = true)

  // ---------------------------------------------------------------
  // q126: gate-threshold ablation sweep over the signals table
  // ---------------------------------------------------------------

  private val SweepMinWords = Seq(5L, 30L, 60L)
  private val SweepMaxDup = Seq(0.05, 0.2, 1.0)

  /** Gate ablation: survivor counts for a grid of (min-words,
    * max-dup-bigram) thresholds, computed from the q123 signals table
    * alone — the "how much would this gate cost us" sweep a corpus
    * team runs before committing thresholds (Gopher A1 reports
    * exactly such removal-rate tables). A doc with an undefined
    * dup-fraction (fewer than two tokens) FAILS every dup gate by
    * rule: a null signal means the gate cannot certify the doc.
    *
    * Thresholds compare against the signals table's ROUNDED fractions
    * (identical in both engines), so the sweep is exact — no FP
    * boundary risk beyond what q123 already carries.
    *
    * Scale: the corpus is touched ONCE (by q123's narrow pass); the
    * sweep itself is grid × signals-table — a slim aggregate whose
    * shuffle carries 9 counter cells, which is the entire point of
    * materializing signals instead of re-gating text per candidate
    * threshold. */
  val q126GateSweep: QueryDef = QueryDef(
    "q126_gate_sweep",
    (s, dir) => {
      val signals = qualitySignalsOf(docs(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("dup_bigram_frac"))
      val grid = SweepMinWords.flatMap(w => SweepMaxDup.map(d => (w, d)))
      signals
        .select(col("doc_id"), col("n_tokens"), col("dup_bigram_frac"),
          explode(typedLit(grid)).as("g"))
        .select(col("doc_id"), col("n_tokens"), col("dup_bigram_frac"),
          col("g._1").as("min_words"), col("g._2").as("max_dup_frac"))
        .groupBy(col("min_words"), col("max_dup_frac"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tokens") >= col("min_words") &&
            col("dup_bigram_frac").isNotNull &&
            col("dup_bigram_frac") <= col("max_dup_frac"), 1L).otherwise(0L))
            .as("n_pass"))
        .withColumn("pass_frac",
          round(col("n_pass").cast("double") / col("n_docs"), 6))
        .orderBy(col("min_words"), col("max_dup_frac"))
    },
    Some(s"""WITH $signalsSqlCtes,
      grid AS (SELECT * FROM (VALUES ${SweepMinWords.flatMap(w =>
        SweepMaxDup.map(d => s"(CAST($w AS BIGINT), CAST($d AS DOUBLE))"))
        .mkString(", ")}) t(min_words, max_dup_frac))
      SELECT g.min_words, g.max_dup_frac,
        count(*) AS n_docs,
        CAST(sum(CASE WHEN s.n_tokens >= g.min_words
          AND s.dup_bigram_frac IS NOT NULL
          AND s.dup_bigram_frac <= g.max_dup_frac THEN 1 ELSE 0 END) AS BIGINT)
          AS n_pass,
        round(CAST(sum(CASE WHEN s.n_tokens >= g.min_words
          AND s.dup_bigram_frac IS NOT NULL
          AND s.dup_bigram_frac <= g.max_dup_frac THEN 1 ELSE 0 END) AS DOUBLE)
          / count(*), 6) AS pass_frac
      FROM signals s, grid g
      GROUP BY g.min_words, g.max_dup_frac
      ORDER BY g.min_words, g.max_dup_frac"""))

  // ---------------------------------------------------------------
  // q158: Shannon-entropy quality signals
  // ---------------------------------------------------------------

  /** Spark-side entropy of an array expression: −Σ p·log2 p over the
    * element distribution, as one codegen'd HOF chain (count each
    * distinct element, fold the entropy terms). */
  private[operators] def entropySpark(arr: String): String =
    s"""aggregate(
       |  transform(array_distinct($arr), c -> cast(size(filter($arr, x -> x = c)) as double)),
       |  0D, (acc, k) -> acc - (k / size($arr)) * log2(k / size($arr)))""".stripMargin

  /** The identical derivation in DuckDB list functions. */
  private def entropyDuck(arr: String): String =
    s"""list_sum(list_transform(
       |  list_transform(list_distinct($arr), c -> CAST(len(list_filter($arr, x -> x = c)) AS DOUBLE)),
       |  k -> -(k / len($arr)) * log2(k / len($arr))))""".stripMargin

  /** Shannon entropy signals: character-level and word-level entropy
    * per document — the compression-proxy quality gate (low char
    * entropy ⇒ repeated characters/boilerplate; low word entropy ⇒
    * keyword stuffing; both ends of the distribution are filtered in
    * RefinedWeb-style pipelines, where the deployed form is a gzip
    * ratio — Shannon entropy is its model-free lower bound and, unlike
    * gzip, is exactly reproducible in portable SQL).
    *
    * Scale: pure per-document HOF arithmetic — a narrow codegen'd
    * map pass, zero shuffle (the sort is harness determinism); cost is
    * O(len · distinct) per doc, bounded by the same explosion budget
    * as the q123 signal bundle it slots beside. */
  val q158Entropy: QueryDef = QueryDef(
    "q158_entropy",
    (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        round(expr(entropySpark("split(text, '')")), 6).as("char_entropy"),
        round(expr(entropySpark("split(trim(text), '\\\\s+')")), 6).as("word_entropy"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
        round(${entropyDuck("string_split(text, '')")}, 6) AS char_entropy,
        round(${entropyDuck("regexp_split_to_array(trim(text), '\\s+')")}, 6) AS word_entropy
      FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // q159: Zipf power-law fit audit
  // ---------------------------------------------------------------

  /** Zipf fit per source: least-squares slope and intercept of
    * log-frequency against log-rank over the top 100 ranks — natural
    * language sits near slope −1 (Zipf's law), so a source whose
    * slope is far off is machine-generated, templated, or corrupt
    * BEFORE any model-based scoring. The regression is the closed
    * form over (Σx, Σy, Σxy, Σx²), all computed on the rank table.
    *
    * Scale: the token count is the vocabulary aggregate every LM op
    * already pays (q96's shuffle class); ranking runs per source over
    * the vocab-sized count table; the regression epilogue is
    * source-count rows. The corpus is scanned once. */
  /** The q159 regression over an arbitrary (source, text) frame —
    * factored out so the spec can feed constructed Zipfian / uniform
    * corpora and pin the slope. */
  private[operators] def zipfFit(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = d
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    val cnt = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("double").as("f"))
    val w = Window.partitionBy(col("source")).orderBy(col("f").desc, col("tok"))
    val top = cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 100)
      .select(col("source"),
        log(col("rk").cast("double")).as("x"), log(col("f")).as("y"))
    top.groupBy(col("source")).agg(
        count(lit(1)).cast("double").as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("m").cast("long").as("n_ranks"),
        (round((col("m") * col("sxy") - col("sx") * col("sy"))
          / (col("m") * col("sxx") - col("sx") * col("sx")), 6) + lit(0.0)).as("slope"),
        (round((col("sy") - (col("m") * col("sxy") - col("sx") * col("sy"))
          / (col("m") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("m"), 6)
          .as("intercept")))
      .orderBy(col("source"))
  }

  val q159ZipfFit: QueryDef = QueryDef(
    "q159_zipf_fit",
    (s, dir) => zipfFit(docs(s, dir)),
    Some("""WITH toks AS (SELECT source,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
      cnt AS (SELECT source, tok, CAST(count(*) AS DOUBLE) AS f
        FROM toks GROUP BY 1, 2),
      rnk AS (SELECT source, tok, f,
          row_number() OVER (PARTITION BY source ORDER BY f DESC, tok) AS rk
        FROM cnt),
      top AS (SELECT source, ln(CAST(rk AS DOUBLE)) AS x, ln(f) AS y
        FROM rnk WHERE rk <= 100),
      agg AS (SELECT source, CAST(count(*) AS DOUBLE) AS m,
          sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        FROM top GROUP BY source)
      SELECT source, CAST(m AS BIGINT) AS n_ranks,
        round((m*sxy - sx*sy) / (m*sxx - sx*sx), 6) + 0.0 AS slope,
        round((sy - (m*sxy - sx*sy) / (m*sxx - sx*sx) * sx) / m, 6) AS intercept
      FROM agg ORDER BY source"""))

  // ---------------------------------------------------------------
  // q163: lexicon tagging (FlashText/Aho-Corasick use case)
  // ---------------------------------------------------------------

  /** The q163 lexicon — a topic/PII-style term list. At scale a
    * lexicon is a broadcast set (or a literal in-set, as here, when it
    * is config-sized); production systems compile it into an
    * Aho-Corasick automaton for multi-term scanning, but for
    * WORD-BOUNDARY terms the token-set intersection below is
    * semantically identical and stays in codegen. */
  private val Lexicon = Seq("spark", "hash", "merge", "window", "stream")

  /** Lexicon tagging: per document, how many token hits the lexicon
    * gets and WHICH distinct terms matched (sorted, joined) — the
    * topic/keyword/blocklist tagging pass (FlashText's use case)
    * expressed as pure array arithmetic: hits = a codegen'd filter
    * count, matched = array_intersect against the literal lexicon.
    * Zero shuffle, zero UDFs; the oracle replays both.
    *
    * Scale: a narrow map pass; the lexicon rides in the plan (or a
    * broadcast variable when it is file-sized). Tagging feeds routing
    * (P9's rule predicate) and the q126-style threshold sweeps. */
  val q163LexiconTag: QueryDef = QueryDef(
    "q163_lexicon_tag",
    (s, dir) => {
      val tk = tokens(col("text"))
      val lex = array(Lexicon.map(lit): _*)
      docs(s, dir).select(col("doc_id"),
        size(filter(tk, t => t.isInCollection(Lexicon))).cast("long").as("n_hits"),
        concat_ws(",", array_sort(array_intersect(array_distinct(tk), lex)))
          .as("matched"))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id,
        CAST(len(list_filter(tk, t -> t IN (${Lexicon.map("'" + _ + "'").mkString(", ")}))) AS BIGINT) AS n_hits,
        coalesce(array_to_string(list_sort(list_intersect(list_distinct(tk),
          [${Lexicon.map("'" + _ + "'").mkString(", ")}])), ','), '') AS matched
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
        FROM documents) x ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // q172: TF-IDF keyword extraction (top-k terms per document)
  // ---------------------------------------------------------------

  /** Per-document top-3 TF-IDF keywords (Spärck Jones 1972; the
    * smoothed idf is sklearn's `ln((1+N)/(1+df)) + 1`, which never
    * zeroes a corpus-wide term): the cheap content-descriptor pass a
    * pipeline uses for topic tagging, near-dup triage, and inverted
    * indexes, with a deterministic (score desc, token asc) tiebreak.
    *
    * Cross-engine note: ranking compares raw ln-derived doubles; exact
    * score ties (same tf and df) fall to the token tiebreak, which
    * both engines resolve identically — the q97 BM25 precedent.
    *
    * Scale: the document-frequency table is vocab-sized (Heaps-law
    * sublinear) and joins the per-doc term counts on the token key;
    * per-doc top-k is a doc_id-partitioned window — the rank shuffle
    * carries (doc_id, tok, counts), never text. Nothing is N². */
  val q172TfidfKeywords: QueryDef = QueryDef(
    "q172_tfidf_keywords",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = docs(s, dir)
        .select(col("doc_id"), explode(tokens(lower(col("text")))).as("tok"))
      val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val nDocs = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          col("tf") * (log((lit(1L) + col("n_docs")).cast("double") /
            (lit(1L) + col("df")).cast("double")) + lit(1.0)))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("tfidf").desc, col("tok"))))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("tok"), col("tf"), col("df"), round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    },
    Some("""WITH toks AS (SELECT doc_id,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents),
      tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
      scored AS (SELECT tf.doc_id, tf.tok, tf.tf, df.df,
          tf.tf * (ln(CAST(1 + n.n_docs AS DOUBLE) / CAST(1 + df.df AS DOUBLE)) + 1.0) AS tfidf,
          CAST(row_number() OVER (PARTITION BY tf.doc_id
            ORDER BY tf.tf * (ln(CAST(1 + n.n_docs AS DOUBLE) / CAST(1 + df.df AS DOUBLE)) + 1.0) DESC,
            tf.tok) AS BIGINT) AS rank
        FROM tf JOIN df USING (tok), n)
      SELECT doc_id, rank, tok, tf, df, round(tfidf, 6) AS tfidf
      FROM scored WHERE rank <= 3 ORDER BY doc_id, rank"""),
    headline = false)

  // ---------------------------------------------------------------
  // q181: Heaps-law vocabulary-growth fit
  // ---------------------------------------------------------------

  /** Heaps' law audit (Heaps 1978: V(N) ≈ K·N^β, β ≈ 0.4-0.6 for
    * natural language) — the vocabulary-growth companion to q159's
    * Zipf rank audit, and the law every "the model table is
    * vocab-sized, it broadcasts" claim in SCALE.md leans on: measure
    * V at 10 corpus prefixes and fit ln V = ln K + β ln N by least
    * squares. β near 1 means vocabulary grows linearly — the corpus
    * is ID-like or generated, and the broadcast-model assumption
    * fails; β in the natural band certifies it. (On the synthetic
    * corpus the audit fires exactly as designed: the template
    * generator's 31-token closed vocabulary saturates at the first
    * sample, and the fit reports β = 0 — "not natural language".)
    *
    * Nested samples WITHOUT a corpus order: the i-th "prefix" is the
    * set of docs whose id-hash bucket falls below i/10 of the bucket
    * space — nested by construction (bucket < t_i ⊂ bucket < t_{i+1}),
    * deterministic, and requiring NO global sort (a rank-based prefix
    * would put the whole corpus through one window partition). One
    * corpus pass reduces every token to its MINIMUM doc bucket (a
    * vocab-sized aggregate), so each sample's vocabulary is a
    * filter-count over that table — no per-sample rescan. Only the
    * ln-space regression epilogue (10 points) is floating point,
    * rounded at 4.
    *
    * Scale: the min-bucket table IS the vocabulary (Heaps-sublinear);
    * the 10-row sample table and the closed-form fit are constant-size
    * epilogues; the growth curve costs one explode + one vocab-keyed
    * shuffle however large the corpus. */
  val q181HeapsFit: QueryDef = QueryDef(
    "q181_heaps_fit",
    (s, dir) => {
      val dd = docs(s, dir)
        .select(col("doc_id"), tokens(lower(col("text"))).as("w"))
        .withColumn("b", expr(
          MixOps.bucketExpr("sha2(cast(doc_id as string), 256)", 65536))
          .cast("long"))
        .withColumn("n_tok", size(col("w")).cast("long"))
      val cuts = s.range(1, 11).toDF("i")
        .select(col("i"), expr("(i * 65536) div 10").as("cut"))
      val firstBucket = dd
        .select(col("b"), explode(col("w")).as("tok"))
        .groupBy(col("tok")).agg(min(col("b")).as("fb"))
      val vocabAt = firstBucket.crossJoin(broadcast(cuts))
        .filter(col("fb") < col("cut"))
        .groupBy(col("i"), col("cut")).agg(count(lit(1)).as("vocab"))
      val tokensAt = dd.crossJoin(broadcast(cuts))
        .filter(col("b") < col("cut"))
        .groupBy(col("i"), col("cut"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      val pts = vocabAt.join(tokensAt, Seq("i", "cut"))
        .withColumn("x", log(col("n_tokens").cast("double")))
        .withColumn("y", log(col("vocab").cast("double")))
      val fit = pts.agg(
          count(lit(1)).as("m"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(
          ((col("sxy") - col("sx") * col("sy") / col("m")) /
            (col("sxx") - col("sx") * col("sx") / col("m"))).as("beta"),
          (col("sy") / col("m")).as("my"), (col("sx") / col("m")).as("mx"))
        // + 0.0 canonicalizes IEEE -0.0 → +0.0: at some SFs the slope
        // rounds to zero and DuckDB's round() preserves the sign bit
        // while Spark's BigDecimal path does not — numerically equal,
        // but repr-level comparators would diverge.
        .select((round(col("beta"), 4) + lit(0.0)).as("beta"),
          round(exp(col("my") - col("beta") * col("mx")), 4).as("k"))
      pts.select(col("i"), col("n_docs"), col("n_tokens"), col("vocab"))
        .crossJoin(broadcast(fit))
        .orderBy(col("i"))
    },
    Some(s"""WITH dd AS (SELECT doc_id,
          regexp_split_to_array(lower(trim(text)), '\\s+') AS w,
          CAST(${MixOps.bucketExpr("sha256(CAST(doc_id AS VARCHAR))", 65536)} AS BIGINT) AS b
        FROM documents),
      dn AS (SELECT doc_id, b, CAST(len(w) AS BIGINT) AS n_tok, w FROM dd),
      cuts AS (SELECT CAST(i AS BIGINT) AS i,
          CAST((i * 65536) // 10 AS BIGINT) AS cut
        FROM range(1, 11) t(i)),
      fb AS (SELECT tok, min(b) AS fb FROM (
          SELECT b, unnest(w) AS tok FROM dn) x GROUP BY tok),
      vocab_at AS (SELECT c.i, c.cut, CAST(count(*) AS BIGINT) AS vocab
        FROM fb, cuts c WHERE fb.fb < c.cut GROUP BY 1, 2),
      tokens_at AS (SELECT c.i, c.cut, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(dn.n_tok) AS BIGINT) AS n_tokens
        FROM dn, cuts c WHERE dn.b < c.cut GROUP BY 1, 2),
      pts AS (SELECT v.i, t.n_docs, t.n_tokens, v.vocab,
          ln(CAST(t.n_tokens AS DOUBLE)) AS x, ln(CAST(v.vocab AS DOUBLE)) AS y
        FROM vocab_at v JOIN tokens_at t ON v.i = t.i AND v.cut = t.cut),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS m, sum(x) AS sx, sum(y) AS sy,
          sum(x * y) AS sxy, sum(x * x) AS sxx FROM pts),
      fit0 AS (SELECT (sxy - sx * sy / m) / (sxx - sx * sx / m) AS beta,
          sy / m AS my, sx / m AS mx FROM agg),
      fit AS (SELECT round(beta, 4) + 0.0 AS beta,
          round(exp(my - beta * mx), 4) AS k FROM fit0)
      SELECT p.i, p.n_docs, p.n_tokens, p.vocab, f.beta, f.k
      FROM pts p, fit f ORDER BY p.i"""),
    headline = false)

  // ---------------------------------------------------------------
  // q211: readability formulas (ARI / Coleman-Liau / Flesch)
  // ---------------------------------------------------------------

  /** Classic readability scores per document — Automated Readability
    * Index (Senter & Smith 1967), Coleman-Liau (1975), and Flesch
    * Reading Ease (1948, with the standard vowel-group syllable
    * heuristic) — the audience-level gate an edu-quality curation pass
    * (the FineWeb-Edu-style signal family) reads alongside q46's
    * surface ratios. All three are closed-form ratios of FOUR integer
    * counts (letters, words, sentences, vowel-group syllables), so the
    * scores are a handful of correctly-rounded IEEE ops — exactly
    * reproducible cross-engine, unlike model-based quality signals.
    *
    *   ARI    = 4.71·(L/W) + 0.5·(W/S) − 21.43
    *   CLI    = 0.0588·(100·L/W) − 0.296·(100·S/W) − 15.8
    *   Flesch = 206.835 − 1.015·(W/S) − 84.6·(Y/W)
    *
    * Sentences floor at 1 (a fragment is one sentence); docs with no
    * word are filtered. Scale: a pure narrow projection — four
    * regexp counters + arithmetic, zero shuffles, codegen end to end. */
  val q211Readability: QueryDef = QueryDef(
    "q211_readability",
    (s, dir) => {
      val w = size(tokens(col("text"))).cast("double")
      val l = expr("regexp_count(text, '[A-Za-z]')").cast("double")
      val sn = greatest(expr("regexp_count(text, '[.!?]+')"), lit(1))
        .cast("double")
      val y = expr("regexp_count(lower(text), '[aeiouy]+')").cast("double")
      docs(s, dir)
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"), w.as("w"), l.as("l"), sn.as("sn"), y.as("y"))
        .select(col("doc_id"),
          col("w").cast("long").as("n_words"),
          col("l").cast("long").as("n_letters"),
          col("sn").cast("long").as("n_sents"),
          col("y").cast("long").as("n_syll"),
          (lit(4.71) * (col("l") / col("w")) +
            lit(0.5) * (col("w") / col("sn")) - lit(21.43)).as("ari"),
          (lit(0.0588) * (lit(100.0) * col("l") / col("w")) -
            lit(0.296) * (lit(100.0) * col("sn") / col("w")) - lit(15.8))
            .as("cli"),
          (lit(206.835) - lit(1.015) * (col("w") / col("sn")) -
            lit(84.6) * (col("y") / col("w"))).as("flesch"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH c AS (SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE) AS w,
        CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS l,
        CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE) AS sn,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE) AS y
      FROM documents WHERE length(trim(text)) > 0)
      SELECT doc_id,
        CAST(w AS BIGINT) AS n_words, CAST(l AS BIGINT) AS n_letters,
        CAST(sn AS BIGINT) AS n_sents, CAST(y AS BIGINT) AS n_syll,
        4.71 * (l / w) + 0.5 * (w / sn) - 21.43 AS ari,
        0.0588 * (100.0 * l / w) - 0.296 * (100.0 * sn / w) - 15.8 AS cli,
        206.835 - 1.015 * (w / sn) - 84.6 * (y / w) AS flesch
      FROM c ORDER BY doc_id"""))

  // ---------------------------------------------------------------
  // q225: token burstiness / dispersion audit
  // ---------------------------------------------------------------

  /** Burstiness audit of the 20 heaviest tokens: Church & Gale's
    * burstiness (1995) — occurrences per CONTAINING document, tf/df —
    * and the Fisher variance-to-mean dispersion index of the per-doc
    * count across ALL documents (VMR = 1 under Poisson scatter;
    * content words clump, VMR ≫ 1; function words spread, VMR ≈ 1).
    * The signal separates topical terms from glue vocabulary with no
    * model at all — the lexicon/stopword/boilerplate triage that
    * keyword extraction (q172) and lexicon tagging (q163) sit on.
    *
    * Exactness: tf, df, Σc² are exact int64 (zero-count docs
    * contribute 0 to both sums, so only the (doc, tok) count table is
    * ever touched); mean = tf/N and VMR = (Σc²/N − mean²)/mean are
    * single double chains rounded at 6. Top-20 cut ranks on (tf desc,
    * token) — a total order.
    *
    * Scale: one (doc, tok) count shuffle (map-side combined), one
    * token-keyed rollup to the vocab table, TakeOrdered 20 — the
    * standard vocab-aggregate shape; N is a 1-row broadcast. */
  val q225Burstiness: QueryDef = QueryDef(
    "q225_burstiness",
    (s, dir) => {
      val d = docs(s, dir)
      val nDocs = d.agg(count(lit(1)).as("n_docs"))
      val perDoc = d
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      perDoc.groupBy(col("tok"))
        .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"),
          sum(col("c") * col("c")).as("sum_c2"))
        .orderBy(col("tf").desc, col("tok")).limit(20)
        .crossJoin(broadcast(nDocs))
        .select(col("tok"), col("tf"), col("df"),
          round(col("tf").cast("double") / col("df"), 6).as("burstiness"),
          round((col("sum_c2").cast("double") / col("n_docs")
              - (col("tf").cast("double") / col("n_docs"))
                * (col("tf").cast("double") / col("n_docs")))
            / (col("tf").cast("double") / col("n_docs")), 6).as("vmr"))
        .orderBy(col("tf").desc, col("tok"))
    },
    Some("""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      pd AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents) x GROUP BY 1, 2),
      v AS (SELECT tok, CAST(sum(c) AS BIGINT) AS tf,
          CAST(count(*) AS BIGINT) AS df,
          CAST(sum(c * c) AS BIGINT) AS sum_c2
        FROM pd GROUP BY tok ORDER BY tf DESC, tok LIMIT 20)
      SELECT tok, tf, df,
        round(CAST(tf AS DOUBLE) / df, 6) AS burstiness,
        round((CAST(sum_c2 AS DOUBLE) / nd.n_docs
            - (CAST(tf AS DOUBLE) / nd.n_docs) * (CAST(tf AS DOUBLE) / nd.n_docs))
          / (CAST(tf AS DOUBLE) / nd.n_docs), 6) AS vmr
      FROM v, nd ORDER BY tf DESC, tok"""),
    headline = false)

  val all: Seq[QueryDef] = Seq(
    q45TokenCount, q46QualityScore, q47LangId, q48Fingerprint, q103Winnowing,
    q113CcnetNormalize, q123QualitySignals, q126GateSweep, q158Entropy,
    q159ZipfFit, q163LexiconTag, q172TfidfKeywords, q181HeapsFit,
    q211Readability, q225Burstiness)
}

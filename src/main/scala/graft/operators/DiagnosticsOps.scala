package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational diagnostics over shuffle keys: the reports an engine
  * operator (or its operator) reads BEFORE choosing salting, AQE skew
  * thresholds, or bucketing counts. These are first-class queries, not
  * logging — the same audit that decides "does this key need a salt"
  * at 100 TB runs oracle-checked here.
  */
object DiagnosticsOps {

  /** Top-N heaviest values of a prospective shuffle key, with each
    * key's share of all rows and the cumulative concentration curve.
    * A top-1 share near 1/numPartitions is harmless; a top-1 share of
    * 0.3 means one straggler task — salt or raise the AQE skew factor.
    *
    * Scale: the per-key count is the ordinary aggregate the eventual
    * shuffle would run anyway; the top-N cut is TakeOrdered (no global
    * sort of the key table); rank and cumulative sum run on the N-row
    * result only. The total is one scalar broadcast back. All counts
    * integer; shares are single long/long divisions, so the oracle is
    * parity-exact. */
  def skewAudit(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topN)
    val w = Window.orderBy(col("n").desc, col("key"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("total"), 6))
      .withColumn("cum_share", round(col("cum_n") / col("total"), 6))
      .select(col("rank"), col("key"), col("n"), col("share"), col("cum_share"))
      .orderBy(col("rank"))
  }

  /** q142: the skew audit over the events stream's natural shuffle key
    * (user_id) — the exact frame consulted before keying sessionize /
    * funnel / retention work at scale. */
  val q142SkewAudit: QueryDef = QueryDef(
    "q142_skew_audit",
    (s, dir) => skewAudit(Tables.load(s, dir, "events"), col("user_id"))
      .withColumnRenamed("key", "user_id"),
    Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
      top AS (SELECT * FROM c ORDER BY n DESC, user_id LIMIT 20),
      r AS (SELECT user_id, n,
        CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rank,
        CAST(sum(n) OVER (ORDER BY n DESC, user_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        FROM top)
      SELECT rank, user_id, n,
        round(n / total, 6) AS share,
        round(cum_n / total, 6) AS cum_share
      FROM r, t ORDER BY rank"""))

  // ---------------------------------------------------------------
  // q152: corpus snapshot diff (incremental-ingest audit)
  // ---------------------------------------------------------------

  /** Content-hash diff of two corpus snapshots: per source, how many
    * documents were added, removed, changed, or unchanged between the
    * previous ingest and the current one. This is the audit a
    * recurring 100 TB crawl runs before incremental processing — only
    * `added`+`changed` rows re-enter the pipeline, `removed` rows are
    * tombstoned downstream, and a `changed` rate far above baseline
    * flags an upstream extraction regression. Snapshots are compared
    * by sha-256, never by text: each side reduces to (doc_id, digest,
    * source) in a narrow codegen'd map stage, so the diff join moves
    * ~100 bytes/row no matter how large documents are.
    *
    * The two snapshots here are DERIVED deterministically from the one
    * documents table (doc_id mod classes simulate deletes/edits/
    * arrivals: docs ≡9 (mod 10) are new in the current snapshot, docs
    * ≡5 (mod 13) were removed, docs ≡3 (mod 7) were edited — their
    * previous text was a half-length truncation), so the oracle can
    * rebuild both sides exactly.
    *
    * Scale: one equi join keyed on doc_id over digest-sized rows — the
    * same shuffle class as the history anti-join (q23) — then a
    * (source, status) rollup whose result is sources×4 rows. The text
    * column never reaches the shuffle (plan-checked). */
  val q152SnapshotDiff: QueryDef = QueryDef(
    "q152_snapshot_diff",
    (s, dir) => {
      val d = Tables.loadParallel(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      val prev = d.filter(col("doc_id") % 10 =!= 9)
        .select(col("doc_id"), col("source").as("prev_source"),
          sha2(when(col("doc_id") % 7 === 3,
              expr("substr(text, 1, greatest(cast(1 as bigint), n_chars div 2))"))
            .otherwise(col("text")), 256).as("prev_hash"))
      val curr = d.filter(col("doc_id") % 13 =!= 5)
        .select(col("doc_id"), col("source").as("curr_source"),
          sha2(col("text"), 256).as("curr_hash"))
      prev.join(curr, Seq("doc_id"), "full_outer")
        .select(
          coalesce(col("curr_source"), col("prev_source")).as("source"),
          when(col("prev_hash").isNull, "added")
            .when(col("curr_hash").isNull, "removed")
            .when(col("prev_hash") =!= col("curr_hash"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("source"), col("status"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("source"), col("status"))
    },
    Some("""WITH prev AS (SELECT doc_id, source AS prev_source,
        sha256(CASE WHEN doc_id % 7 = 3
          THEN substr(text, 1, greatest(1, n_chars // 2))
          ELSE text END) AS prev_hash
        FROM documents WHERE doc_id % 10 <> 9),
      curr AS (SELECT doc_id, source AS curr_source, sha256(text) AS curr_hash
        FROM documents WHERE doc_id % 13 <> 5)
      SELECT coalesce(curr_source, prev_source) AS source,
        CASE WHEN prev_hash IS NULL THEN 'added'
             WHEN curr_hash IS NULL THEN 'removed'
             WHEN prev_hash <> curr_hash THEN 'changed'
             ELSE 'unchanged' END AS status,
        CAST(count(*) AS BIGINT) AS n
      FROM prev FULL OUTER JOIN curr USING (doc_id)
      GROUP BY 1, 2 ORDER BY source, status"""))

  // ---------------------------------------------------------------
  // q191: change-magnitude audit (how much did changed docs change?)
  // ---------------------------------------------------------------

  /** Shingle-Jaccard magnitude of every `changed` document between the
    * q152 snapshots — the follow-up question the diff's counts raise:
    * a `changed` doc might be a one-line touch-up (re-extract cheaply,
    * keep downstream caches) or a full rewrite (re-run the whole
    * pipeline); rsync/content-defined-dedup tooling makes exactly this
    * distinction. Similarity = Jaccard over distinct 3-token shingles
    * of the previous vs current text, classed at 0.5 into minor/major.
    *
    * Both versions of a document live in the SAME row (the q152
    * snapshot synthesis is a projection), so the comparison is pure
    * per-row array arithmetic — NO join, no shuffle, nothing pairwise
    * across documents; at 100 TB with real snapshot tables this
    * becomes the q152 doc_id-keyed equi join (id-keyed, never N²)
    * feeding the same row-local arithmetic.
    *
    * Parity: shingle sets are exact string arrays; |∩|/|∪| is one
    * integer division rounded at 6; the empty-vs-empty edge scores 1
    * by convention on both engines. */
  val q191ChangeMagnitude: QueryDef = QueryDef(
    "q191_change_magnitude",
    (s, dir) => {
      // guard size < 3 explicitly: sequence(1, 0) is the DESCENDING
      // [1, 0] in Spark, and element_at would then throw — the same
      // guard DedupOps.shingled carries (the oracle's range(1, n+1)
      // is naturally empty for short docs)
      def shingles(tokCol: String): org.apache.spark.sql.Column = expr(
        s"""case when size($tokCol) >= 3
           |  then array_distinct(transform(sequence(1, size($tokCol) - 2),
           |    i -> concat_ws(' ', element_at($tokCol, i),
           |      element_at($tokCol, i + 1), element_at($tokCol, i + 2))))
           |  else cast(array() as array<string>) end""".stripMargin)
      Tables.loadParallel(s, dir, "documents")
        .filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 13 =!= 5 &&
          col("doc_id") % 7 === 3)
        .withColumn("prev_text",
          expr("substr(text, 1, greatest(cast(1 as bigint), n_chars div 2))"))
        .withColumn("pw", split(trim(col("prev_text")), "\\s+"))
        .withColumn("cw", split(trim(col("text")), "\\s+"))
        .withColumn("ps", shingles("pw"))
        .withColumn("cs", shingles("cw"))
        .withColumn("n_inter", size(array_intersect(col("ps"), col("cs"))).cast("long"))
        .withColumn("n_union", size(array_union(col("ps"), col("cs"))).cast("long"))
        .withColumn("similarity",
          when(col("n_union") === 0L, lit(1.0))
            .otherwise(round(col("n_inter").cast("double") / col("n_union"), 6)))
        .select(col("doc_id"), col("n_inter"), col("n_union"), col("similarity"),
          when(col("similarity") >= 0.5, "minor").otherwise("major").as("churn"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH ch AS (SELECT doc_id,
          regexp_split_to_array(trim(substr(text, 1, greatest(1, n_chars // 2))), '\s+') AS pw,
          regexp_split_to_array(trim(text), '\s+') AS cw
        FROM documents
        WHERE doc_id % 10 <> 9 AND doc_id % 13 <> 5 AND doc_id % 7 = 3),
      sh AS (SELECT doc_id,
          list_distinct(list_transform(range(1, greatest(len(pw) - 2, 0) + 1),
            i -> pw[i] || ' ' || pw[i + 1] || ' ' || pw[i + 2])) AS ps,
          list_distinct(list_transform(range(1, greatest(len(cw) - 2, 0) + 1),
            i -> cw[i] || ' ' || cw[i + 1] || ' ' || cw[i + 2])) AS cs
        FROM ch),
      j AS (SELECT doc_id,
          CAST(len(list_intersect(ps, cs)) AS BIGINT) AS n_inter,
          CAST(len(list_distinct(list_concat(ps, cs))) AS BIGINT) AS n_union
        FROM sh)
      SELECT doc_id, n_inter, n_union,
        CASE WHEN n_union = 0 THEN 1.0
             ELSE round(CAST(n_inter AS DOUBLE) / n_union, 6) END AS similarity,
        CASE WHEN (CASE WHEN n_union = 0 THEN 1.0
             ELSE round(CAST(n_inter AS DOUBLE) / n_union, 6) END) >= 0.5
          THEN 'minor' ELSE 'major' END AS churn
      FROM j ORDER BY doc_id"""),
    headline = false)

  // ---------------------------------------------------------------
  // q195: chunk-level delta savings between snapshots (rsync view)
  // ---------------------------------------------------------------

  /** What a chunk-level delta actually saves when re-ingesting the
    * changed docs: for each q152-`changed` document, the fraction of
    * its CURRENT content-defined chunks (q176's CDC cuts) already
    * present in its PREVIOUS version — exactly the rsync/CAS-storage
    * question ("how many blocks must transfer?"), and the
    * quantitative follow-up to q191's similarity class: q191 says how
    * much the text changed, this says how much storage/transfer the
    * chunk store saves because CDC boundaries re-synchronized around
    * the edit. Reported per doc (token masses are exact integers;
    * the one ratio rounds at 6) with the corpus totals on every row.
    *
    * Scale: both versions chunk in the SAME row-local pass (the q191
    * argument — real snapshot tables pay one doc_id-keyed equi join
    * first), then per-doc array arithmetic over chunk-hash lists;
    * nothing shuffles but the output epilogue. */
  val q195ChunkDelta: QueryDef = {
    val W = 4
    val D = 8
    QueryDef(
      "q195_chunk_delta",
      (s, dir) => {
        // row-local CDC over one token array: chunk hash list + lengths
        def chunksOf(tokCol: String): String =
          s"""transform(
             |  filter(transform(sequence(1, size($tokCol)),
             |    i -> struct(i,
             |      (i = size($tokCol)) or (i >= $W and
             |        ${MixOps.bucketExpr(
                 s"sha2(array_join(slice($tokCol, i - ${W - 1}, $W), ' '), 256)",
                 D)} = 0) as b)),
             |    x -> x.b),
             |  x -> x.i)""".stripMargin
        val d = Tables.loadParallel(s, dir, "documents")
          .filter(col("doc_id") % 10 =!= 9 && col("doc_id") % 13 =!= 5 &&
            col("doc_id") % 7 === 3)
          .withColumn("pw", split(trim(
            expr("substr(text, 1, greatest(cast(1 as bigint), n_chars div 2))")), "\\s+"))
          .withColumn("cw", split(trim(col("text")), "\\s+"))
          .withColumn("pb", expr(chunksOf("pw")))
          .withColumn("cb", expr(chunksOf("cw")))
          // chunk i spans (bounds[i-1], bounds[i]]: hash the joined slice
          .withColumn("pch", expr(
            s"""transform(sequence(1, size(pb)), j -> sha2(array_join(
               |  slice(pw, if(j = 1, 1, element_at(pb, j - 1) + 1),
               |    element_at(pb, j) - if(j = 1, 0, element_at(pb, j - 1))), ' '), 256))""".stripMargin))
          .withColumn("cch", expr(
            s"""transform(sequence(1, size(cb)), j -> struct(
               |  sha2(array_join(
               |    slice(cw, if(j = 1, 1, element_at(cb, j - 1) + 1),
               |      element_at(cb, j) - if(j = 1, 0, element_at(cb, j - 1))), ' '), 256) as h,
               |  element_at(cb, j) - if(j = 1, 0, element_at(cb, j - 1)) as len))""".stripMargin))
        d.select(col("doc_id"),
            size(col("cw")).cast("long").as("n_tokens"),
            size(col("cch")).cast("long").as("n_chunks"),
            expr("aggregate(filter(cch, c -> array_contains(pch, c.h)), 0L, (a, c) -> a + c.len)")
              .as("reused_tokens"))
          .withColumn("reuse_frac",
            round(col("reused_tokens").cast("double") / col("n_tokens"), 6))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ch AS (SELECT doc_id,
            regexp_split_to_array(trim(substr(text, 1, greatest(1, n_chars // 2))), '\\s+') AS pw,
            regexp_split_to_array(trim(text), '\\s+') AS cw
          FROM documents
          WHERE doc_id % 10 <> 9 AND doc_id % 13 <> 5 AND doc_id % 7 = 3),
        b AS (SELECT doc_id, pw, cw,
            list_transform(list_filter(
              list_transform(range(1, len(pw) + 1), i -> {'i': i,
                'b': i = len(pw) OR (i >= $W AND
                  ${MixOps.bucketExpr(
                    s"sha256(array_to_string(pw[i - ${W - 1}:i], ' '))", D)} = 0)}),
              x -> x.b), x -> x.i) AS pb,
            list_transform(list_filter(
              list_transform(range(1, len(cw) + 1), i -> {'i': i,
                'b': i = len(cw) OR (i >= $W AND
                  ${MixOps.bucketExpr(
                    s"sha256(array_to_string(cw[i - ${W - 1}:i], ' '))", D)} = 0)}),
              x -> x.b), x -> x.i) AS cb
          FROM ch),
        h AS (SELECT doc_id, cw,
            list_transform(range(1, len(pb) + 1), j -> sha256(array_to_string(
              pw[CASE WHEN j = 1 THEN 1 ELSE pb[j - 1] + 1 END:pb[j]], ' '))) AS pch,
            list_transform(range(1, len(cb) + 1), j -> {
              'h': sha256(array_to_string(
                cw[CASE WHEN j = 1 THEN 1 ELSE cb[j - 1] + 1 END:cb[j]], ' ')),
              'len': cb[j] - CASE WHEN j = 1 THEN 0 ELSE cb[j - 1] END}) AS cch
          FROM b)
        SELECT doc_id, CAST(len(cw) AS BIGINT) AS n_tokens,
          CAST(len(cch) AS BIGINT) AS n_chunks,
          CAST(coalesce(list_sum(list_transform(
            list_filter(cch, c -> list_contains(pch, c.h)), c -> c.len)), 0) AS BIGINT)
            AS reused_tokens,
          round(CAST(coalesce(list_sum(list_transform(
            list_filter(cch, c -> list_contains(pch, c.h)), c -> c.len)), 0) AS DOUBLE)
            / len(cw), 6) AS reuse_frac
        FROM h ORDER BY doc_id"""),
      headline = false)
  }

  // ---------------------------------------------------------------
  // q222: Lorenz curve + Gini of corpus composition
  // ---------------------------------------------------------------

  /** Source-concentration audit — the Lorenz curve (Lorenz 1905) and
    * Gini coefficient (Gini 1912) of per-source token mass, the
    * standard inequality read a dataset card reports ("how dominated
    * is this corpus by its largest sources?") and the quantitative
    * companion to the q115/q121/q173 mixing knobs that exist to REDUCE
    * it. With sources sorted ascending by token count w₁ ≤ … ≤ w_k,
    *
    *   G = 2·Σᵢ i·wᵢ / (k·Σw) − (k+1)/k
    *
    * (the exact discrete form). Output: one Lorenz point per source
    * (cumulative source share vs cumulative token share) with the
    * corpus Gini on every row.
    *
    * Determinism: counts and the Σ i·wᵢ moment are exact int64; the
    * Gini and shares are rounded aggregates. Rank ties break by
    * source name.
    *
    * Scale: the corpus reduces to the SOURCE table (one keyed agg
    * with map-side combine) before any ranking — the window and
    * epilogue touch k rows, the q142 skew-audit posture. */
  val q222GiniConcentration: QueryDef = QueryDef(
    "q222_gini_concentration",
    (s, dir) => {
      val w = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("w"))
      val byW = Window.orderBy(col("w"), col("source"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val ranked = w
        .withColumn("i", row_number().over(byW).cast("long"))
        .withColumn("cum_w", sum(col("w")).over(
          Window.orderBy(col("w"), col("source"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("tot", sum(col("w")).over(wAll))
        .withColumn("iw", sum(col("i") * col("w")).over(wAll))
      ranked.select(col("source"), col("i"), col("w"),
          round(col("i").cast("double") / col("k"), 6).as("pop_share"),
          round(col("cum_w").cast("double") / col("tot"), 6).as("mass_share"),
          // + 0.0: a near-uniform corpus's Gini can round to IEEE -0.0
          // under DuckDB while Spark emits +0.0 — canonicalize
          (round(lit(2.0) * col("iw").cast("double") /
              (col("k").cast("double") * col("tot").cast("double")) -
            (col("k") + 1).cast("double") / col("k").cast("double"), 6)
            + lit(0.0)).as("gini"))
        .orderBy(col("i"))
    },
    Some("""WITH w AS (SELECT source,
          CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
            AS BIGINT) AS w
        FROM documents WHERE length(trim(text)) > 0 GROUP BY 1),
      rk AS (SELECT source, w,
          CAST(row_number() OVER (ORDER BY w, source) AS BIGINT) AS i,
          CAST(sum(w) OVER (ORDER BY w, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_w,
          CAST(count(*) OVER () AS BIGINT) AS k,
          CAST(sum(w) OVER () AS BIGINT) AS tot
        FROM w),
      g AS (SELECT CAST(sum(i * w) AS BIGINT) AS iw FROM rk)
      SELECT rk.source, rk.i, rk.w,
        round(CAST(rk.i AS DOUBLE) / rk.k, 6) AS pop_share,
        round(CAST(rk.cum_w AS DOUBLE) / rk.tot, 6) AS mass_share,
        round(2.0 * CAST(g.iw AS DOUBLE) /
            (CAST(rk.k AS DOUBLE) * CAST(rk.tot AS DOUBLE)) -
          CAST(rk.k + 1 AS DOUBLE) / CAST(rk.k AS DOUBLE), 6) + 0.0 AS gini
      FROM rk, g ORDER BY rk.i"""),
    headline = false)

  // ---------------------------------------------------------------
  // q223: Hampel median/MAD robust outlier gate
  // ---------------------------------------------------------------

  /** Robust per-source length-outlier audit — the Hampel identifier
    * (Hampel 1974; the X84 rule): flag documents whose token count
    * deviates from the SOURCE MEDIAN by more than 3·1.4826·MAD
    * (1.4826 = the consistency constant making MAD estimate σ under
    * normality). Median/MAD resist the very outliers they hunt, which
    * is why curation gates prefer them to mean/sd (q180's z-scores)
    * on length-like heavy-tailed signals.
    *
    * Exactness at scale, the q214/q220 grid discipline twice over:
    * the corpus reduces to the (source, token-count) GRID, the median
    * is picked from grid cumulative counts at rank ⌈n/2⌉, the MAD
    * from a second grid of |x − med| built FROM THE FIRST GRID (never
    * re-scanning the corpus), and the outlier count itself sums grid
    * cells — one corpus scan total, windows only on grids.
    *
    * Determinism: medians are exact int64 grid picks (lower median);
    * the gate compares int64 deviations to one double threshold. */
  val q223HampelOutliers: QueryDef = QueryDef(
    "q223_hampel_outliers",
    (s, dir) => {
      val grid = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
        .groupBy(col("source"), col("nt")).agg(count(lit(1)).as("c"))
      val bySrc = Window.partitionBy(col("source"))
      val byNt = Window.partitionBy(col("source")).orderBy(col("nt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val withCum = grid
        .withColumn("cum", sum(col("c")).over(byNt))
        .withColumn("n", sum(col("c")).over(
          bySrc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val med = withCum
        .filter(col("cum") >= ((col("n") + 1) / 2).cast("long"))
        .groupBy(col("source")).agg(min(col("nt")).as("med"))
      val dgrid = grid.join(med, "source")
        .select(col("source"), abs(col("nt") - col("med")).as("dev"),
          col("c"), col("med"))
        .groupBy(col("source"), col("med"), col("dev"))
        .agg(sum(col("c")).as("c"))
      val byDev = Window.partitionBy(col("source")).orderBy(col("dev"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val mad = dgrid
        .withColumn("cum", sum(col("c")).over(byDev))
        .withColumn("n", sum(col("c")).over(
          bySrc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .filter(col("cum") >= ((col("n") + 1) / 2).cast("long"))
        .groupBy(col("source"), col("med")).agg(min(col("dev")).as("mad"))
      grid.join(mad, "source")
        .withColumn("out",
          when(abs(col("nt") - col("med")).cast("double") >
            lit(3.0) * lit(1.4826) * col("mad").cast("double"), col("c"))
            .otherwise(lit(0L)))
        .groupBy(col("source"), col("med"), col("mad"))
        .agg(sum(col("c")).as("n_docs"), sum(col("out")).as("n_outliers"))
        .select(col("source"), col("n_docs"), col("med"), col("mad"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n_docs"), 6)
            .as("outlier_frac"))
        .orderBy(col("source"))
    },
    Some("""WITH grid AS (SELECT source,
          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS nt,
          CAST(count(*) AS BIGINT) AS c
        FROM documents WHERE length(trim(text)) > 0 GROUP BY 1, 2),
      cum AS (SELECT *, CAST(sum(c) OVER (PARTITION BY source ORDER BY nt
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM grid),
      med AS (SELECT source, min(nt) AS med FROM cum
        WHERE cum >= (n + 1) // 2 GROUP BY source),
      dg AS (SELECT g.source, m.med, abs(g.nt - m.med) AS dev,
          CAST(sum(g.c) AS BIGINT) AS c
        FROM grid g JOIN med m USING (source) GROUP BY 1, 2, 3),
      dcum AS (SELECT *, CAST(sum(c) OVER (PARTITION BY source ORDER BY dev
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
          CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM dg),
      mad AS (SELECT source, any_value(med) AS med, min(dev) AS mad
        FROM dcum WHERE cum >= (n + 1) // 2 GROUP BY source)
      SELECT g.source,
        CAST(sum(g.c) AS BIGINT) AS n_docs, m.med, m.mad,
        CAST(sum(CASE WHEN CAST(abs(g.nt - m.med) AS DOUBLE) >
          3.0 * 1.4826 * CAST(m.mad AS DOUBLE) THEN g.c ELSE 0 END)
          AS BIGINT) AS n_outliers,
        round(CAST(sum(CASE WHEN CAST(abs(g.nt - m.med) AS DOUBLE) >
          3.0 * 1.4826 * CAST(m.mad AS DOUBLE) THEN g.c ELSE 0 END)
          AS DOUBLE) / sum(g.c), 6) AS outlier_frac
      FROM grid g JOIN mad m USING (source)
      GROUP BY g.source, m.med, m.mad ORDER BY g.source"""),
    headline = false)

  // ---------------------------------------------------------------
  // q224: Benford first-digit audit of a numeric feed
  // ---------------------------------------------------------------

  /** First-significant-digit distribution of the price feed against
    * Benford's law (Newcomb 1881; Benford 1938) with the χ² goodness-
    * of-fit — the classic fabricated-or-truncated-feed screen an
    * ingest pipeline runs on any scale-spanning numeric column
    * (amounts, sizes, counts): organically-grown magnitudes follow
    * P(d) = log10(1 + 1/d); a generator, a unit clamp, or a silent
    * truncation shows up as a χ² blowup over the 9-cell grid. (A
    * negative finding is itself the audit: TPC-H-style uniform prices
    * are NOT Benford — the query reports that, loudly.)
    *
    * Cross-engine exactness: the first digit is taken from the
    * INTEGER cent count's decimal string (round(x·100) → BIGINT →
    * leading char), never from log10 of a double — integer-to-string
    * is exact in both engines where float log10 near a power of ten
    * is a last-ulp coin flip. Counts are int64; shares, expected
    * masses, and the χ² are rounded aggregates over the 9-row grid.
    *
    * Scale: one narrow map to a digit ∈ [1,9] + one 9-cell keyed agg
    * with full map-side combine; everything after runs on 9 rows. */
  val q224Benford: QueryDef = QueryDef(
    "q224_benford",
    (s, dir) => {
      val observed = Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice") > 0)
        .select(substring(round(col("l_extendedprice") * 100, 0)
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      // all 9 Benford cells: a digit with ZERO observations still
      // contributes its expected mass to the χ² (dropping it would
      // understate exactly the anomaly the audit hunts)
      val digits = s.range(1, 10).toDF("d")
        .join(observed, col("d") === col("digit"), "left_outer")
        .select(col("d").cast("int").as("digit"),
          coalesce(col("n"), lit(0L)).as("n"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val g = digits
        .withColumn("total", sum(col("n")).over(wAll))
        .withColumn("benford_p", log10(lit(1.0) + lit(1.0) / col("digit")))
        .withColumn("expected", col("benford_p") * col("total"))
        .withColumn("chi2_term",
          (col("n") - col("expected")) * (col("n") - col("expected"))
            / col("expected"))
      g.withColumn("chi2", sum(col("chi2_term")).over(wAll))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("total"), 6).as("share"),
          round(col("benford_p"), 6).as("benford_p"),
          round(col("chi2_term"), 6).as("chi2_term"),
          round(col("chi2"), 6).as("chi2"),
          // χ²(8 df) 5% critical value
          (col("chi2") > 15.507).as("rejected"))
        .orderBy(col("digit"))
    },
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100, 0)
            AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        FROM lineitem WHERE l_extendedprice > 0),
      g0 AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
      g AS (SELECT CAST(r.d AS INT) AS digit, coalesce(g0.n, 0) AS n
        FROM range(1, 10) r(d) LEFT JOIN g0 ON g0.digit = r.d),
      t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS total,
          log10(1.0 + 1.0 / digit) AS benford_p
        FROM g),
      c AS (SELECT *, benford_p * total AS expected,
          (n - benford_p * total) * (n - benford_p * total)
            / (benford_p * total) AS chi2_term
        FROM t)
      SELECT digit, n,
        round(CAST(n AS DOUBLE) / total, 6) AS share,
        round(benford_p, 6) AS benford_p,
        round(chi2_term, 6) AS chi2_term,
        round(sum(chi2_term) OVER (), 6) AS chi2,
        sum(chi2_term) OVER () > 15.507 AS rejected
      FROM c ORDER BY digit"""),
    headline = false)

  // ---------------------------------------------------------------
  // q229: diversity indices of corpus composition
  // ---------------------------------------------------------------

  /** The dataset-card diversity row — Shannon entropy (nats) with its
    * effective-source count e^H (Hill number of order 1), Simpson
    * concentration λ = Σp² with inverse-Simpson 1/λ (Hill order 2),
    * and the Berger-Parker dominance max(p) (Hill order ∞) — over
    * per-source token mass: the q222 Gini's ecology-standard
    * companions, answering "how many sources is this corpus REALLY"
    * at three tail-sensitivities (H counts moderate sources, 1/λ
    * weights the heavy ones, Berger-Parker only the heaviest).
    *
    * Scale: q222's posture exactly — one keyed corpus agg down to the
    * SOURCE table, then a one-row epilogue over k cells; all shares
    * are int64/int64 divisions, indices rounded aggregates. */
  val q229Diversity: QueryDef = QueryDef(
    "q229_diversity",
    (s, dir) => {
      val w = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("w"))
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      w.withColumn("tot", sum(col("w")).over(wAll))
        .select(col("source"), (col("w").cast("double") / col("tot")).as("p"))
        .agg(count(lit(1)).as("n_sources"),
          (-sum(col("p") * log(col("p")))).as("h"),
          sum(col("p") * col("p")).as("simpson"),
          max(col("p")).as("berger_parker"))
        .select(col("n_sources"),
          round(col("h"), 6).as("shannon_h"),
          round(exp(col("h")), 6).as("eff_sources_h1"),
          round(col("simpson"), 6).as("simpson"),
          round(lit(1.0) / col("simpson"), 6).as("eff_sources_h2"),
          round(col("berger_parker"), 6).as("berger_parker"))
    },
    Some("""WITH w AS (SELECT source,
          CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+')))
            AS BIGINT) AS w
        FROM documents WHERE length(trim(text)) > 0 GROUP BY 1),
      p AS (SELECT source, CAST(w AS DOUBLE) / CAST(sum(w) OVER () AS BIGINT) AS p
        FROM w)
      SELECT CAST(count(*) AS BIGINT) AS n_sources,
        round(-sum(p * ln(p)), 6) AS shannon_h,
        round(exp(-sum(p * ln(p))), 6) AS eff_sources_h1,
        round(sum(p * p), 6) AS simpson,
        round(1.0 / sum(p * p), 6) AS eff_sources_h2,
        round(max(p), 6) AS berger_parker
      FROM p"""),
    headline = false)

  // ---------------------------------------------------------------
  // q227: top-k rank churn between corpus halves (rank-biased overlap)
  // ---------------------------------------------------------------

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between the
    * top-100 token rankings of the corpus's two doc_id-parity halves —
    * the indefinite-ranking stability statistic a snapshot monitor
    * reads where q152's diff reads raw deltas: with S, T the two
    * rankings and A_d their prefix-intersection size at depth d,
    *
    *   RBO@D(p) = (1−p) · Σ_{d=1..D} p^{d−1} · A_d / d,   p = 0.9
    *
    * Top-weighted on purpose: churn at rank 3 moves RBO far more than
    * churn at rank 90, which matches what a drifting head of the vocab
    * means operationally. Two stable halves of one corpus give the
    * in-distribution baseline; run against consecutive snapshots, a
    * drop below it is the alarm.
    *
    * Determinism: ranks and A_d are exact integers; the geometric sum
    * accumulates over the 100-row depth grid through an ORDERED
    * cumulative window (both engines add rows in frame order — no
    * unordered float aggregate), rounded at 6.
    *
    * Scale: one (half, token) count shuffle; ranking windows run on
    * the two vocab tables; everything after lives on a 100-row grid. */
  val q227RankChurn: QueryDef = QueryDef(
    "q227_rank_churn",
    (s, dir) => {
      val Depth = 100
      val P = 0.9
      val toks = Tables.loadParallel(s, dir, "documents")
        .select((col("doc_id") % 2).as("half"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy(col("half"), col("tok")).agg(count(lit(1)).as("n"))
      val byHalf = Window.partitionBy(col("half"))
        .orderBy(col("n").desc, col("tok"))
      val ranked = toks.withColumn("rk", row_number().over(byHalf))
        .filter(col("rk") <= Depth)
      val m = ranked.filter(col("half") === 0)
        .select(col("tok"), col("rk").as("rk_a"))
        .join(ranked.filter(col("half") === 1)
          .select(col("tok"), col("rk").as("rk_b")), Seq("tok"))
        .select(greatest(col("rk_a"), col("rk_b")).as("m"))
      val grid = s.range(1, Depth + 1).toDF("d")
      val byD = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid.join(broadcast(m), col("m") <= col("d"), "left_outer")
        .groupBy(col("d")).agg(count(col("m")).as("a_d"))
        .withColumn("term",
          pow(lit(P), col("d") - 1) * col("a_d").cast("double") / col("d"))
        // (1−p) as its own literal 0.1 — both engines must parse the
        // same constant rather than one computing 1.0 − 0.9
        .withColumn("rbo_cum", sum(col("term")).over(byD) * lit(0.1))
        .filter(col("d") === Depth)
        .select(col("d").cast("long").as("depth"), lit(P).as("p"),
          col("a_d").as("overlap_at_depth"),
          round(col("a_d").cast("double") / (lit(2 * Depth) - col("a_d")), 6)
            .as("jaccard_at_depth"),
          round(col("rbo_cum"), 6).as("rbo"))
    },
    Some("""WITH toks AS (SELECT doc_id % 2 AS half,
          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        FROM documents),
      c AS (SELECT half, tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY 1, 2),
      rk AS (SELECT half, tok, row_number() OVER (PARTITION BY half
          ORDER BY n DESC, tok) AS rk FROM c),
      top AS (SELECT * FROM rk WHERE rk <= 100),
      m AS (SELECT greatest(a.rk, b.rk) AS m
        FROM top a JOIN top b ON a.tok = b.tok AND a.half = 0 AND b.half = 1),
      grid AS (SELECT CAST(d AS BIGINT) AS d FROM range(1, 101) t(d)),
      ad AS (SELECT g.d, CAST(count(m.m) AS BIGINT) AS a_d
        FROM grid g LEFT JOIN m ON m.m <= g.d GROUP BY g.d),
      term AS (SELECT d, a_d,
          pow(0.9, d - 1) * CAST(a_d AS DOUBLE) / d AS term FROM ad),
      cum AS (SELECT d, a_d, sum(term) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 0.1 AS rbo_cum
        FROM term)
      SELECT d AS depth, 0.9 AS p, a_d AS overlap_at_depth,
        round(CAST(a_d AS DOUBLE) / (200 - a_d), 6) AS jaccard_at_depth,
        round(rbo_cum, 6) AS rbo
      FROM cum WHERE d = 100"""),
    headline = false)

  // ---------------------------------------------------------------
  // q231: Kendall τ-b rank correlation on the joint value grid
  // ---------------------------------------------------------------

  /** Exact tie-corrected Kendall τ-b (Kendall 1945) between document
    * length (tokens) and lexical richness (distinct tokens) — the
    * robust monotone-association audit that complements q157's Pearson
    * covariance (Pearson sees a linear trend; τ sees ANY monotone one
    * and ignores outliers entirely, which length-like heavy tails
    * poison):
    *
    *   τ_b = (C − D) / √((n₀ − t_x)(n₀ − t_y)),  n₀ = n(n−1)/2
    *
    * with C/D the concordant/discordant pair counts and t_x/t_y the
    * tie terms Σ t(t−1)/2 per distinct value.
    *
    * Exactness at scale — the q214/q220 grid discipline: both signals
    * are small integers, so the corpus reduces to the JOINT (x, y)
    * count grid in one keyed agg; C and D are Σ c_a·c_b over ordered
    * CELL pairs (value-cardinality-bounded, never doc pairs), the tie
    * terms are marginal rollups of the same grid, and every count is
    * exact int64 — only the final ratio is a rounded double. A corpus
    * of any size with bounded signal cardinality pays grid² cell
    * pairs, not n² document pairs. */
  val q231KendallTau: QueryDef = QueryDef(
    "q231_kendall_tau",
    (s, dir) => {
      val grid = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(split(lower(trim(col("text"))), "\\s+").as("w"))
        .select(size(col("w")).cast("long").as("x"),
          size(array_distinct(col("w"))).cast("long").as("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
      val pairs = grid.as("a").join(grid.as("b"), col("a.x") < col("b.x"))
        .agg(
          sum(when(col("a.y") < col("b.y"),
            col("a.c") * col("b.c")).otherwise(0L)).as("concordant"),
          sum(when(col("a.y") > col("b.y"),
            col("a.c") * col("b.c")).otherwise(0L)).as("discordant"))
      val n = grid.agg(sum(col("c")).as("n"))
      val tx = grid.groupBy(col("x")).agg(sum(col("c")).as("t"))
        .agg(sum(expr("t * (t - 1) div 2")).as("tie_x"))
      val ty = grid.groupBy(col("y")).agg(sum(col("c")).as("t"))
        .agg(sum(expr("t * (t - 1) div 2")).as("tie_y"))
      pairs.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty))
        .withColumn("n0", expr("n * (n - 1) div 2"))
        .select(col("n").as("n_docs"), col("concordant"), col("discordant"),
          col("tie_x"), col("tie_y"),
          round((col("concordant") - col("discordant")).cast("double") /
            sqrt((col("n0") - col("tie_x")).cast("double") *
              (col("n0") - col("tie_y")).cast("double")), 6).as("tau_b"))
    },
    Some("""WITH per AS (SELECT
          CAST(len(w) AS BIGINT) AS x,
          CAST(len(list_distinct(w)) AS BIGINT) AS y
        FROM (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
          FROM documents WHERE length(trim(text)) > 0) z),
      grid AS (SELECT x, y, CAST(count(*) AS BIGINT) AS c
        FROM per GROUP BY 1, 2),
      p AS (SELECT
          CAST(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS BIGINT)
            AS concordant,
          CAST(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS BIGINT)
            AS discordant
        FROM grid a JOIN grid b ON a.x < b.x),
      nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM grid),
      tx AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tie_x FROM (
        SELECT CAST(sum(c) AS BIGINT) AS t FROM grid GROUP BY x) g),
      ty AS (SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tie_y FROM (
        SELECT CAST(sum(c) AS BIGINT) AS t FROM grid GROUP BY y) g)
      SELECT nn.n AS n_docs, p.concordant, p.discordant, tx.tie_x, ty.tie_y,
        round(CAST(p.concordant - p.discordant AS DOUBLE) /
          sqrt(CAST(nn.n * (nn.n - 1) // 2 - tx.tie_x AS DOUBLE) *
            CAST(nn.n * (nn.n - 1) // 2 - ty.tie_y AS DOUBLE)), 6) + 0.0 AS tau_b
      FROM p, nn, tx, ty"""),
    headline = false)

  // ---------------------------------------------------------------
  // q232: Mann-Whitney U between two sources' length distributions
  // ---------------------------------------------------------------

  /** Exact tie-corrected Mann-Whitney U / Wilcoxon rank-sum test
    * (Mann & Whitney 1947) between src0's and src1's document token
    * counts — the distribution-free "did these two feeds draw from
    * the same length distribution" check (q220's KS localizes WHERE
    * CDFs diverge; U asks the rank-shift question, the one robust to
    * shape):
    *
    *   U = R_A − n_A(n_A+1)/2,
    *   z = (U − n_A·n_B/2 ∓ ½) / √(n_A·n_B/12 · ((n+1) − Σ(t³−t)/(n(n−1))))
    *
    * Exactness, the q220 grid trick with integer rank sums: both
    * samples reduce to the merged VALUE grid; the tied-rank sum is
    * kept as the INTEGER 2R_A = Σ c_A·(2·cum_before + t + 1), so U and
    * the tie spectrum are exact int64 and only the z normalization is
    * a rounded double chain.
    *
    * Scale: one value-keyed count shuffle; windows and the test run on
    * the value grid — identical posture to q220/q223. */
  val q232MannWhitney: QueryDef = QueryDef(
    "q232_mann_whitney",
    (s, dir) => {
      val grid = Tables.loadParallel(s, dir, "documents")
        .filter(col("source").isin("src0", "src1"))
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("x"))
        .groupBy(col("x")).agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ca"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("cb"))
      val byX = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, 0)
      grid
        .withColumn("t", col("ca") + col("cb"))
        .withColumn("cum", sum(col("t")).over(byX))
        .withColumn("r2_term",
          col("ca") * (lit(2) * (col("cum") - col("t")) + col("t") + 1))
        .withColumn("tie_term", col("t") * col("t") * col("t") - col("t"))
        .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("r2_term")).as("r2"), sum(col("tie_term")).as("ties"))
        .withColumn("n", col("na") + col("nb"))
        .withColumn("u",
          (col("r2") - col("na") * (col("na") + 1)).cast("double") / 2.0)
        .withColumn("mean_u",
          col("na").cast("double") * col("nb").cast("double") / 2.0)
        .withColumn("var_u",
          col("na").cast("double") * col("nb").cast("double") / 12.0 *
            ((col("n") + 1).cast("double") -
              col("ties").cast("double") /
                (col("n").cast("double") * (col("n") - 1).cast("double"))))
        .withColumn("zraw", when(col("u") > col("mean_u"),
            (col("u") - col("mean_u") - 0.5) / sqrt(col("var_u")))
          .when(col("u") < col("mean_u"),
            (col("u") - col("mean_u") + 0.5) / sqrt(col("var_u")))
          .otherwise(lit(0.0)))
        .select(col("na"), col("nb"), round(col("u"), 6).as("u"),
          (round(col("zraw"), 6) + lit(0.0)).as("z"),
          (abs(col("zraw")) > 1.96).as("rejected"))
    },
    Some("""WITH v AS (SELECT source,
          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
        FROM documents
        WHERE source IN ('src0', 'src1') AND length(trim(text)) > 0),
      grid AS (SELECT x,
          CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM v GROUP BY x),
      st AS (SELECT *, ca + cb AS t,
          CAST(sum(ca + cb) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM grid),
      agg AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb,
          CAST(sum(ca * (2 * (cum - t) + t + 1)) AS BIGINT) AS r2,
          CAST(sum(t * t * t - t) AS BIGINT) AS ties
        FROM st),
      m AS (SELECT *, na + nb AS n,
          CAST(r2 - na * (na + 1) AS DOUBLE) / 2.0 AS u,
          CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0 AS mean_u
        FROM agg),
      z AS (SELECT *,
          CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
            (CAST(n + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
              (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS var_u
        FROM m),
      zz AS (SELECT *,
          CASE WHEN u > mean_u THEN (u - mean_u - 0.5) / sqrt(var_u)
               WHEN u < mean_u THEN (u - mean_u + 0.5) / sqrt(var_u)
               ELSE 0.0 END AS zraw
        FROM z)
      SELECT na, nb, round(u, 6) AS u, round(zraw, 6) + 0.0 AS z,
        abs(zraw) > 1.96 AS rejected
      FROM zz"""),
    headline = false)

  // ---------------------------------------------------------------
  // q233: Cramér's V between two categorical columns
  // ---------------------------------------------------------------

  /** Association strength between `source` and `lang` — Pearson's χ²
    * over the contingency grid normalized to Cramér's V (1946),
    *
    *   V = √( χ² / (n · (min(r, k) − 1)) ) ∈ [0, 1]
    *
    * — the "is language confounded with source" pre-flight a mixture
    * designer runs before per-source language quotas (a high V means
    * source caps ARE language caps, and q115/q121's knobs interact).
    *
    * Exactness: observed counts and both marginals are exact int64
    * from ONE grid; expected counts e = row·col/n and the χ² fold are
    * grid-bounded doubles rounded at 6.
    *
    * Scale: one (source, lang) keyed agg with map-side combine —
    * cells = |sources|×|langs|, everything after is an epilogue.
    * Degenerate 1×k / r×1 tables (single source or single lang) have
    * no defined association — cramers_v is NULL there, identically in
    * both engines, instead of a NaN from the min(r,k)−1 = 0 divisor. */
  val q233CramersV: QueryDef = QueryDef(
    "q233_cramers_v",
    (s, dir) => {
      val obs = Tables.loadParallel(s, dir, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
      // complete the r×k grid: a ZERO cell still contributes (0−e)²/e
      // = e to the χ² — dropping it understates exactly the perfect-
      // association case the statistic exists to flag
      val grid = obs.select(col("source")).distinct()
        .crossJoin(broadcast(obs.select(col("lang")).distinct()))
        .join(obs, Seq("source", "lang"), "left_outer")
        .withColumn("o", coalesce(col("o"), lit(0L)))
      val bySrc = Window.partitionBy(col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val byLang = Window.partitionBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      grid
        .withColumn("row_t", sum(col("o")).over(bySrc))
        .withColumn("col_t", sum(col("o")).over(byLang))
        .withColumn("n", sum(col("o")).over(wAll))
        .withColumn("e", col("row_t").cast("double") * col("col_t") / col("n"))
        .withColumn("term", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
        .agg(countDistinct(col("source")).as("r"),
          countDistinct(col("lang")).as("k"),
          max(col("n")).as("n"), sum(col("term")).as("chi2"))
        .select(col("r"), col("k"), col("n"),
          round(col("chi2"), 6).as("chi2"),
          // association is undefined for a 1×k (or r×1) table:
          // min(r,k)−1 = 0 would divide by zero — emit NULL, not NaN
          when(least(col("r"), col("k")) > 1,
            round(sqrt(col("chi2") / (col("n") *
              (least(col("r"), col("k")) - 1))), 6))
            .otherwise(lit(null).cast("double")).as("cramers_v"))
    },
    Some("""WITH obs AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2),
      grid AS (SELECT s.source, l.lang, coalesce(obs.o, 0) AS o
        FROM (SELECT DISTINCT source FROM obs) s
        CROSS JOIN (SELECT DISTINCT lang FROM obs) l
        LEFT JOIN obs USING (source, lang)),
      m AS (SELECT *, CAST(sum(o) OVER (PARTITION BY source) AS BIGINT) AS row_t,
          CAST(sum(o) OVER (PARTITION BY lang) AS BIGINT) AS col_t,
          CAST(sum(o) OVER () AS BIGINT) AS n
        FROM grid),
      t AS (SELECT *, CAST(row_t AS DOUBLE) * col_t / n AS e FROM m)
      SELECT CAST(count(DISTINCT source) AS BIGINT) AS r,
        CAST(count(DISTINCT lang) AS BIGINT) AS k,
        CAST(max(n) AS BIGINT) AS n,
        round(sum((o - e) * (o - e) / e), 6) AS chi2,
        CASE WHEN least(count(DISTINCT source), count(DISTINCT lang)) > 1
          THEN round(sqrt(sum((o - e) * (o - e) / e) /
            (max(n) * (least(count(DISTINCT source), count(DISTINCT lang)) - 1))), 6)
          ELSE NULL END AS cramers_v
      FROM t"""),
    headline = false)

  // ---------------------------------------------------------------
  // q234: population stability index between corpus halves
  // ---------------------------------------------------------------

  /** PSI (population stability index — the model-monitoring industry's
    * standard drift score) of the document-length distribution between
    * the corpus's doc_id-parity halves:
    *
    *   PSI = Σ_b (p_B(b) − p_A(b)) · ln(p_B(b)/p_A(b))
    *
    * over 10 buckets whose EDGES are half A's exact length deciles
    * (grid rank picks at ⌈q·n_A⌉ — the q223 lower-median rule per
    * decile), so the reference half defines the binning the way a
    * deployed monitor freezes training-time bins. PSI < 0.1 = stable,
    * 0.1-0.25 = shifting, > 0.25 = alarm (the conventional bands,
    * reported as a class column). Two parity halves of one corpus
    * give the in-distribution baseline; against a new snapshot the
    * same query is the drift gate.
    *
    * Exactness: decile edges and bucket counts are integer grid
    * arithmetic; only the Σ (Δp·ln ratio) epilogue over 10 cells is
    * floating point, rounded at 6. Bucket probabilities carry the
    * standard +0.5 smoothing (p = (c+0.5)/(n+0.5·B)) so a bucket
    * drained in one half — the very shape a drift gate must flag —
    * yields a large finite PSI instead of ±Infinity.
    *
    * Scale: q220's posture — one length-keyed count shuffle; edges,
    * buckets, and the PSI run on the grid. */
  val q234Psi: QueryDef = QueryDef(
    "q234_psi",
    (s, dir) => {
      val v = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select((col("doc_id") % 2).as("half"),
          size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("x"))
      val grid = v.groupBy(col("x")).agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
      val byX = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val withCum = grid
        .withColumn("cum_a", sum(col("ca")).over(byX))
        .withColumn("na", sum(col("ca")).over(Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      // decile edges: min x with cum_a >= ceil(q·na), q = 0.1..0.9
      val edges = s.range(1, 10).toDF("q")
        .join(broadcast(withCum.select(col("x"), col("cum_a"), col("na"))),
          col("cum_a") * 10 >= col("q") * col("na"))
        .groupBy(col("q")).agg(min(col("x")).as("edge"))
      val bucketed = grid.crossJoin(broadcast(
          edges.agg(collect_list(col("edge")).as("es"))))
        .withColumn("b", expr(
          "1 + size(filter(es, e -> e < x))").cast("long"))
        .groupBy(col("b")).agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
      val tot = bucketed.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("nbk"))
      // +0.5 per-bucket smoothing (the standard PSI continuity
      // correction): a bucket empty in one half — exactly the drifted
      // case the gate exists for — would otherwise drive ln(pb/pa) to
      // ±Infinity and poison the sum
      val terms = bucketed.crossJoin(broadcast(tot))
        .withColumn("pa", (col("ca") + 0.5) / (col("na") + col("nbk") * 0.5))
        .withColumn("pb", (col("cb") + 0.5) / (col("nb") + col("nbk") * 0.5))
        .withColumn("term", (col("pb") - col("pa")) * log(col("pb") / col("pa")))
      terms.agg(max(col("na")).as("n_ref"), max(col("nb")).as("n_cur"),
          count(lit(1)).as("n_buckets"), sum(col("term")).as("psi"))
        .select(col("n_ref"), col("n_cur"), col("n_buckets"),
          round(col("psi"), 6).as("psi"),
          when(col("psi") < 0.1, "stable")
            .when(col("psi") < 0.25, "shifting")
            .otherwise("alarm").as("verdict"))
    },
    Some("""WITH v AS (SELECT doc_id % 2 AS half,
          CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS x
        FROM documents WHERE length(trim(text)) > 0),
      grid AS (SELECT x,
          CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM v GROUP BY x),
      cumg AS (SELECT *, CAST(sum(ca) OVER (ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
          CAST(sum(ca) OVER () AS BIGINT) AS na
        FROM grid),
      edges AS (SELECT q, min(x) AS edge
        FROM range(1, 10) t(q) JOIN cumg ON cum_a * 10 >= q * na
        GROUP BY q),
      bucketed AS (SELECT
          1 + (SELECT count(*) FROM edges e WHERE e.edge < g.x) AS b,
          g.ca, g.cb
        FROM grid g),
      bsum AS (SELECT b, CAST(sum(ca) AS BIGINT) AS ca,
          CAST(sum(cb) AS BIGINT) AS cb
        FROM bucketed GROUP BY b),
      tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          CAST(sum(cb) AS BIGINT) AS nb,
          CAST(count(*) AS BIGINT) AS nbk FROM bsum),
      terms AS (SELECT b,
          (CAST(ca AS DOUBLE) + 0.5) / (na + 0.5 * nbk) AS pa,
          (CAST(cb AS DOUBLE) + 0.5) / (nb + 0.5 * nbk) AS pb
        FROM bsum, tot)
      SELECT (SELECT na FROM tot) AS n_ref, (SELECT nb FROM tot) AS n_cur,
        CAST(count(*) AS BIGINT) AS n_buckets,
        round(sum((pb - pa) * ln(pb / pa)), 6) AS psi,
        CASE WHEN sum((pb - pa) * ln(pb / pa)) < 0.1 THEN 'stable'
             WHEN sum((pb - pa) * ln(pb / pa)) < 0.25 THEN 'shifting'
             ELSE 'alarm' END AS verdict
      FROM terms"""),
    headline = false)

  // ---------------------------------------------------------------
  // q235: pairwise source Jensen–Shannon divergence
  // ---------------------------------------------------------------

  /** Pairwise Jensen–Shannon divergence (Lin 1991; base 2, so
    * jsd ∈ [0,1]) between the per-source unigram token distributions —
    * the source-similarity matrix a mixture designer reads next to
    * q226's content-overlap matrix: q226 answers "do these sources
    * share DOCUMENTS", this answers "do they speak the same
    * DISTRIBUTION" (a source can be 0%-duplicate yet distributionally
    * redundant, and vice versa).
    *
    * Decomposition that avoids a full-outer token join: for the shared
    * support the summand is the usual ½pa·ln(2pa/(pa+pb)) +
    * ½pb·ln(2pb/(pa+pb)); a token in exactly one source contributes
    * ½p·ln 2 nats exactly, so each pair's one-sided part collapses to
    * ½·(1 − sharedMass) bits — computed from the shared-mass sums, no
    * anti-join needed. Both engines sum in NATS and convert once by
    * /ln 2 (one shared-constant division, the q228 ln-parity
    * discipline), rounded at 6.
    *
    * Scale: corpus → (source, tok) grid in ONE keyed agg with map-side
    * combine; the pair join is grid×grid equi on tok (S rows per key,
    * S=|sources|), and the S²/2-row pair table is completed by a
    * broadcast cross of the S-row totals — the corpus never
    * self-joins. */
  val q235SourceJsd: QueryDef = QueryDef(
    "q235_source_jsd",
    (s, dir) => {
      val toks = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      val grid = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("n"))
      val tot = grid.groupBy(col("source")).agg(sum(col("n")).as("t"))
      val ga = grid.join(tot, "source")
        .select(col("source").as("src_a"), col("tok"),
          col("n").as("na"), col("t").as("ta"))
      // tok_b: distinct name on the self-join's right side — joining
      // ga("tok") === gb("tok") on two frames of one lineage trips
      // Spark's ambiguous-self-join resolution (it warns and relies on
      // dataset-id disambiguation; an explicit rename never does)
      val gb = grid.join(tot, "source")
        .select(col("source").as("src_b"), col("tok").as("tok_b"),
          col("n").as("nb"), col("t").as("tb"))
      val shared = ga.join(gb,
          col("tok") === col("tok_b") && col("src_a") < col("src_b"))
        .withColumn("pa", col("na").cast("double") / col("ta"))
        .withColumn("pb", col("nb").cast("double") / col("tb"))
        .withColumn("term",
          lit(0.5) * col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) +
          lit(0.5) * col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb"))))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("shared_tokens"),
          sum(col("na")).as("sa"), sum(col("nb")).as("sb"),
          sum(col("term")).as("term_nats"))
      val pairs = tot.select(col("source").as("src_a"), col("t").as("ta"))
        .crossJoin(broadcast(
          tot.select(col("source").as("src_b"), col("t").as("tb"))))
        .filter(col("src_a") < col("src_b"))
      pairs.join(shared, Seq("src_a", "src_b"), "left_outer")
        .na.fill(0L, Seq("shared_tokens", "sa", "sb"))
        .na.fill(0.0, Seq("term_nats"))
        .select(col("src_a"), col("src_b"), col("shared_tokens"),
          round(col("term_nats") / log(lit(2.0)) +
            lit(0.5) * (lit(1.0) - col("sa").cast("double") / col("ta")) +
            lit(0.5) * (lit(1.0) - col("sb").cast("double") / col("tb")), 6)
            .as("jsd"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some("""WITH toks AS (SELECT source,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE length(trim(text)) > 0),
      grid AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY 1, 2),
      tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS t FROM grid GROUP BY 1),
      shared AS (SELECT a.source AS src_a, b.source AS src_b,
          a.n AS na, b.n AS nb,
          a.n / CAST(ta.t AS DOUBLE) AS pa, b.n / CAST(tb.t AS DOUBLE) AS pb
        FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
        JOIN tot ta ON ta.source = a.source
        JOIN tot tb ON tb.source = b.source),
      agg AS (SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_tokens,
          CAST(sum(na) AS BIGINT) AS sa, CAST(sum(nb) AS BIGINT) AS sb,
          sum(0.5 * pa * ln(2.0 * pa / (pa + pb)) +
              0.5 * pb * ln(2.0 * pb / (pa + pb))) AS term_nats
        FROM shared GROUP BY 1, 2),
      pairs AS (SELECT a.source AS src_a, a.t AS ta, b.source AS src_b, b.t AS tb
        FROM tot a, tot b WHERE a.source < b.source)
      SELECT src_a, src_b,
        coalesce(shared_tokens, 0) AS shared_tokens,
        round(coalesce(term_nats, 0.0) / ln(2.0) +
          0.5 * (1.0 - coalesce(sa, 0) / CAST(ta AS DOUBLE)) +
          0.5 * (1.0 - coalesce(sb, 0) / CAST(tb AS DOUBLE)), 6) AS jsd
      FROM pairs LEFT JOIN agg USING (src_a, src_b)
      ORDER BY src_a, src_b"""),
    headline = false)

  // ---------------------------------------------------------------
  // q236: Heaps-law vocabulary-growth fit
  // ---------------------------------------------------------------

  /** Heaps-law fit V(N) ≈ K·N^β over the ingest order: distinct
    * vocabulary size V_k versus cumulative token count N_k at each
    * 50-doc ingest bucket, OLS-fit in log-log space. β is THE number
    * the engine's scale arguments lean on ("vocab-bounded grids grow
    * sublinearly") — this query measures it on the actual corpus
    * instead of asserting it, the same discipline as q129's
    * saturation curve for dedup budgets. Reported: point count, β
    * (slope), ln K (intercept — kept in log space so no cross-engine
    * exp), and R² (NULL when fewer than 2 buckets or zero variance).
    *
    * Exactness: N_k and V_k are exact int64 (first-occurrence bucket
    * assignment = q129's min-doc_id trick on tokens); the OLS runs on
    * ≤ corpus/50 log points via the textbook sum formulas, identical
    * in both engines, rounded at 6.
    *
    * Scale: one token-keyed agg (min doc_id per token — the exact-
    * dedup shuffle class) + one bucket-keyed count; windows and the
    * regression run on the BUCKET grid only. */
  val q236HeapsFit: QueryDef = QueryDef(
    "q236_heaps_fit",
    (s, dir) => {
      val toks = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .withColumn("bucket", expr("doc_id div 50"))
      val tokCount = toks.groupBy(col("bucket")).agg(count(lit(1)).as("n_tok"))
      val newTypes = toks.groupBy(col("tok")).agg(min(col("bucket")).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
      val w = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val pts = tokCount.join(newTypes, Seq("bucket"), "left_outer")
        .na.fill(0L, Seq("new_types"))
        .withColumn("nk", sum(col("n_tok")).over(w))
        .withColumn("vk", sum(col("new_types")).over(w))
        .select(log(col("nk").cast("double")).as("x"),
          log(col("vk").cast("double")).as("y"), col("vk"))
      pts.agg(count(lit(1)).as("k"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"),
          // the zero-variance test must be INTEGER-exact: on a
          // saturated corpus vk is constant, deny is mathematically 0,
          // and the k·Σy²−(Σy)² residue's SIGN is summation-order /
          // engine dependent (sf0.1 hit this: Spark ≤ 0 → NULL,
          // DuckDB > 0 → 0.0). min(vk) < max(vk) decides degeneracy
          // from the int64 grid instead
          min(col("vk")).as("vmin"), max(col("vk")).as("vmax"))
        .withColumn("den", col("k") * col("sxx") - col("sx") * col("sx"))
        .withColumn("deny", col("k") * col("syy") - col("sy") * col("sy"))
        .withColumn("num", col("k") * col("sxy") - col("sx") * col("sy"))
        // + 0.0 on the signed fits: a saturated vocabulary's slope is
        // an exact zero whose IEEE sign depends on summation order
        // (sf0.1 hit this — DuckDB prints -0.0, Spark 0.0)
        .select(col("k").as("n_points"),
          when(col("den") > 0, round(col("num") / col("den"), 6) + lit(0.0))
            .otherwise(lit(null).cast("double")).as("beta"),
          when(col("den") > 0, round((col("sy") - (col("num") / col("den")) *
            col("sx")) / col("k"), 6) + lit(0.0))
            .otherwise(lit(null).cast("double")).as("ln_k"),
          // vmin < vmax is the degeneracy test, but deny > 0 must ALSO
          // hold before dividing: a near-saturated corpus (vk varies by
          // one step) can cancel k·Σy²−(Σy)² to 0 or negative in
          // floating point, and the residue's sign is engine-dependent —
          // the same drift class the vmin/vmax guard fixed (r13 ADVICE)
          when(col("den") > 0 && col("vmin") < col("vmax") && col("deny") > 0,
            round(col("num") * col("num") / (col("den") * col("deny")), 6))
            .otherwise(lit(null).cast("double")).as("r2"))
    },
    Some("""WITH toks AS (SELECT doc_id // 50 AS bucket,
          unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE length(trim(text)) > 0),
      tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok
        FROM toks GROUP BY 1),
      nt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_types FROM
        (SELECT tok, min(bucket) AS bucket FROM toks GROUP BY tok) f
        GROUP BY 1),
      pts AS (SELECT
          ln(CAST(sum(tc.n_tok) OVER (ORDER BY tc.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) AS x,
          ln(CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY tc.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)) AS y,
          CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY tc.bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vk
        FROM tc LEFT JOIN nt USING (bucket)),
      sums AS (SELECT CAST(count(*) AS BIGINT) AS k,
          sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
          sum(y*y) AS syy, sum(x*y) AS sxy,
          min(vk) AS vmin, max(vk) AS vmax FROM pts),
      d AS (SELECT *, k * sxx - sx * sx AS den, k * syy - sy * sy AS deny,
          k * sxy - sx * sy AS num FROM sums)
      SELECT k AS n_points,
        CASE WHEN den > 0 THEN round(num / den, 6) + 0.0 ELSE NULL END AS beta,
        CASE WHEN den > 0 THEN round((sy - (num / den) * sx) / k, 6) + 0.0
             ELSE NULL END AS ln_k,
        CASE WHEN den > 0 AND vmin < vmax AND deny > 0
             THEN round(num * num / (den * deny), 6) ELSE NULL END AS r2
      FROM d"""),
    headline = false)

  // ---------------------------------------------------------------
  // q237: Good–Turing unseen mass + Chao1 richness
  // ---------------------------------------------------------------

  /** Good–Turing unseen-probability mass and Chao1 vocabulary-richness
    * estimate from the frequency-of-frequencies table: P₀ = N₁/N (the
    * Good–Turing estimate of the probability the NEXT token is a
    * never-seen type — equivalently 1−coverage), and the
    * bias-corrected Chao1 richness V̂ = V + N₁(N₁−1)/(2(N₂+1))
    * (Chao 1984, bias-corrected form — defined even when no doubletons
    * exist). The "is this corpus big enough" pre-flight: a high P₀
    * says token statistics (LM scores, DSIR weights, tokenizer merges)
    * are still moving; Chao1 bounds how much vocabulary the next
    * crawl can add.
    *
    * Exactness: counts, V, N, N₁, N₂ are exact int64 from two keyed
    * aggs; the three reported ratios are single integer-over-integer
    * double divisions, rounded at 6 — bit-deterministic cross-engine.
    *
    * Scale: token-keyed count (the exact-dedup shuffle class) folded
    * to the frequency-of-frequencies GRID (rows = distinct counts,
    * ≤ a few hundred at any corpus size); the epilogue reads the
    * grid. */
  val q237GoodTuring: QueryDef = QueryDef(
    "q237_good_turing",
    (s, dir) => {
      val counts = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val fof = counts.groupBy(col("c")).agg(count(lit(1)).as("nc"))
      fof.agg(sum(col("nc")).as("vocab"),
          sum(col("c") * col("nc")).as("n_tokens"),
          sum(when(col("c") === 1, col("nc")).otherwise(0L)).as("n1"),
          sum(when(col("c") === 2, col("nc")).otherwise(0L)).as("n2"))
        .select(col("vocab"), col("n_tokens"), col("n1"), col("n2"),
          round(col("n1").cast("double") / col("n_tokens"), 6).as("p_unseen"),
          round(lit(1.0) - col("n1").cast("double") / col("n_tokens"), 6)
            .as("coverage"),
          round(col("vocab") + col("n1").cast("double") * (col("n1") - 1) /
            (lit(2.0) * (col("n2") + 1)), 6).as("chao1"))
    },
    Some("""WITH counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM
        (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
         FROM documents WHERE length(trim(text)) > 0) t GROUP BY tok),
      fof AS (SELECT c, CAST(count(*) AS BIGINT) AS nc FROM counts GROUP BY c),
      s AS (SELECT CAST(sum(nc) AS BIGINT) AS vocab,
          CAST(sum(c * nc) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN c = 1 THEN nc ELSE 0 END) AS BIGINT) AS n1,
          CAST(sum(CASE WHEN c = 2 THEN nc ELSE 0 END) AS BIGINT) AS n2
        FROM fof)
      SELECT vocab, n_tokens, n1, n2,
        round(CAST(n1 AS DOUBLE) / n_tokens, 6) AS p_unseen,
        round(1.0 - CAST(n1 AS DOUBLE) / n_tokens, 6) AS coverage,
        round(vocab + CAST(n1 AS DOUBLE) * (n1 - 1) / (2.0 * (n2 + 1)), 6)
          AS chao1
      FROM s"""),
    headline = false)

  // ---------------------------------------------------------------
  // q238: Zipf rank-frequency fit
  // ---------------------------------------------------------------

  /** Zipf's-law fit f(r) ≈ C·r^s over the token rank-frequency curve —
    * q236's companion (Heaps and Zipf exponents are the two numbers a
    * corpus datasheet quotes, and they are analytically linked:
    * β ≈ −1/s). Natural corpora measure s ≈ −1; a synthetic or
    * template-heavy corpus measures s far from −1, which together with
    * β ≈ 0 is the "this corpus will not scale like real text" signal
    * (see SCALE.md round 13 — the saturated generator corpus is
    * exactly such a case).
    *
    * Estimator: the rank-frequency plot collapsed on ties — one point
    * per DISTINCT frequency f at its MINIMUM rank (ranks of f-tied
    * types form a contiguous block; the block head is the standard
    * tie-collapsed Zipf plot), OLS-fit in log-log space. This keeps
    * every computation on the frequency-of-frequencies GRID: min-rank
    * per f is an exclusive cumulative sum over the grid ordered by f
    * descending, so nothing vocabulary-sized needs a global window.
    *
    * Exactness: f, m_f, and the min-ranks are exact int64; the OLS
    * runs the q236 sum formulas over ≤ |distinct frequencies| ≈ O(√N)
    * log points. Signed fits carry the +0.0 canonicalization. */
  val q238ZipfFit: QueryDef = QueryDef(
    "q238_zipf_fit",
    (s, dir) => {
      val counts = Tables.loadParallel(s, dir, "documents")
        .filter(length(trim(col("text"))) > 0)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      val fof = counts.groupBy(col("f")).agg(count(lit(1)).as("m"))
      val byFDesc = Window.orderBy(col("f").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val pts = fof
        .withColumn("minrank", coalesce(sum(col("m")).over(byFDesc),
          lit(0L)) + 1L)
        .select(log(col("minrank").cast("double")).as("x"),
          log(col("f").cast("double")).as("y"))
      pts.agg(count(lit(1)).as("k"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("den", col("k") * col("sxx") - col("sx") * col("sx"))
        .withColumn("deny", col("k") * col("syy") - col("sy") * col("sy"))
        .withColumn("num", col("k") * col("sxy") - col("sx") * col("sy"))
        .select(col("k").as("n_points"),
          when(col("den") > 0, round(col("num") / col("den"), 6) + lit(0.0))
            .otherwise(lit(null).cast("double")).as("zipf_s"),
          when(col("den") > 0, round((col("sy") - (col("num") / col("den")) *
            col("sx")) / col("k"), 6) + lit(0.0))
            .otherwise(lit(null).cast("double")).as("ln_c"),
          when(col("den") > 0 && col("deny") > 0,
            round(col("num") * col("num") / (col("den") * col("deny")), 6))
            .otherwise(lit(null).cast("double")).as("r2"))
    },
    Some("""WITH counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM
        (SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
         FROM documents WHERE length(trim(text)) > 0) t GROUP BY tok),
      fof AS (SELECT f, CAST(count(*) AS BIGINT) AS m FROM counts GROUP BY f),
      pts AS (SELECT
          ln(CAST(coalesce(sum(m) OVER (ORDER BY f DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
            AS DOUBLE)) AS x,
          ln(CAST(f AS DOUBLE)) AS y
        FROM fof),
      sums AS (SELECT CAST(count(*) AS BIGINT) AS k,
          sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
          sum(y*y) AS syy, sum(x*y) AS sxy FROM pts),
      d AS (SELECT *, k * sxx - sx * sx AS den, k * syy - sy * sy AS deny,
          k * sxy - sx * sy AS num FROM sums)
      SELECT k AS n_points,
        CASE WHEN den > 0 THEN round(num / den, 6) + 0.0 ELSE NULL END
          AS zipf_s,
        CASE WHEN den > 0 THEN round((sy - (num / den) * sx) / k, 6) + 0.0
             ELSE NULL END AS ln_c,
        CASE WHEN den > 0 AND deny > 0
             THEN round(num * num / (den * deny), 6) ELSE NULL END AS r2
      FROM d"""),
    headline = false)

  val all: Seq[QueryDef] = Seq(q142SkewAudit, q152SnapshotDiff,
    q191ChangeMagnitude, q195ChunkDelta, q222GiniConcentration,
    q223HampelOutliers, q224Benford, q227RankChurn, q229Diversity,
    q231KendallTau, q232MannWhitney, q233CramersV, q234Psi,
    q235SourceJsd, q236HeapsFit, q237GoodTuring, q238ZipfFit)
}

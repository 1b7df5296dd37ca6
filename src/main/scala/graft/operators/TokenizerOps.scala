package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer-training operators: byte-pair-encoding merge learning
  * (Sennrich et al. 2016, the public BPE algorithm GPT/Llama-family
  * tokenizers build on) over the corpus word-frequency table.
  *
  * Scale design: BPE trains on the WORD-FREQUENCY table, not the
  * corpus — one corpus-size explode+count builds it, and every merge
  * round is an aggregate + a narrow symbol-array rewrite over that
  * vocabulary-sized frame (Heaps' law: ~10⁷-10⁸ rows at 100 TB, a
  * trivial Spark job). The argmax pair per round is one tiny sorted
  * limit(1); rounds materialize the rewritten vocab so lineage stays
  * flat (q91's iteration discipline). The corpus is touched exactly
  * once.
  */
object TokenizerOps {

  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Staging.materialize(df, tag, "spark.graft.corpus.stagingDir")

  private val NMerges = 8

  /** The corpus word stream — ONE definition shared with the LM tier
    * (LmOps.tokenizedOf's tokenization), so BPE trains on exactly the
    * word stream the perplexity/DSIR models see. */
  private def words(d: DataFrame): DataFrame =
    LmOps.tokenizedOf(d)
      .select(col("doc_id"), explode(col("w")).as("word"))
      .filter(length(col("word")) >= 1)

  /** (word, freq, syms) — the BPE training table: distinct corpus words
    * with frequencies, each word split into single-character symbols. */
  private def wordTable(d: DataFrame): DataFrame =
    materialize(words(d)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), "")), "bpe_words")

  /** One greedy left-to-right merge pass of the pair (l, r) over a
    * symbol-array column — shared verbatim by training and encoding so
    * the two halves cannot drift, and by WordPieceOps (whose merged
    * symbol drops the `##` continuation marker, hence the explicit
    * `merged` argument). Column-parameterized: symbols are corpus
    * text, never spliced into an expr string. After a merge the new
    * last symbol `merged` (= l + payload of r) can never equal `l`
    * again in the same pass (r's payload is non-empty), so the fold
    * needs no overlap flag to match the reference algorithm's one-pass
    * semantics. */
  private[operators] def mergeFoldColTo(syms: org.apache.spark.sql.Column,
      l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column,
      merged: org.apache.spark.sql.Column) =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === l && s === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
          .otherwise(concat(acc, array(s))))

  private def mergeFoldCol(syms: org.apache.spark.sql.Column,
      l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
    mergeFoldColTo(syms, l, r, concat(l, r))

  private def mergeFold(syms: org.apache.spark.sql.Column, l: String, r: String) =
    mergeFoldCol(syms, lit(l), lit(r))

  /** Learn `n` BPE merges: each round counts adjacent symbol pairs
    * weighted by word frequency, picks the most frequent (ties broken
    * lexicographically), and rewrites every word's symbol array with
    * the greedy left-to-right merge. Returns (left, right, pairFreq)
    * per round, most-frequent first. */
  def bpeMerges(d: DataFrame, n: Int = NMerges): Seq[(String, String, Long)] =
    bpeMergesFrom(wordTable(d), n)

  /** Merge learning over an already-built (word, freq, syms) table, so
    * a caller that also encodes (q105) builds the table once. */
  def bpeMergesFrom(table: DataFrame, n: Int = NMerges): Seq[(String, String, Long)] = {
    var cur = table
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var round = 0
    while (round < n) {
      val top = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        // Spark string order is binary UTF-8 = code-point order; the
        // spec's reference tie-break compares by code points to match
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) return out.toSeq
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((l, r, c))
      round += 1
      // the final round's rewrite is never read — skip the dead job
      if (round < n)
        cur = materialize(cur.withColumn("syms", mergeFold(col("syms"), l, r)),
          s"bpe_round$round")
    }
    out.toSeq
  }

  /** The learned merge table as an inspectable operator output. No
    * DuckDB oracle (the merge loop is iterative and data-dependent);
    * correctness is proven against an independent reference BPE
    * implementation in TokenizerOpsSpec, q77's no-oracle convention. */
  val q104BpeMerges: QueryDef = QueryDef(
    "q104_bpe_merges",
    (s, dir) => {
      val merges = bpeMerges(Tables.loadParallel(s, dir, "documents"))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        merges.zipWithIndex.map { case ((l, r, c), i) =>
          org.apache.spark.sql.Row(i.toLong + 1, l, r, l + r, c)
        }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("left",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("right",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("merged",
            org.apache.spark.sql.types.StringType, nullable = false),
          org.apache.spark.sql.types.StructField("pair_freq",
            org.apache.spark.sql.types.LongType, nullable = false))))
        .orderBy(col("rank"))
    },
    None)

  /** Lowest-rank merge applicable to a `syms` column, or null: the
    * learned merge list is a rank-ordered literal array (broadcast as
    * part of the plan), filtered to pairs present among the word's
    * adjacent symbols; element 1 of the survivor list is the
    * lowest-rank applicable merge — exactly the min-rank bigram lookup
    * canonical encoders perform per iteration. */
  private def bestMergeExpr(merges: Seq[(String, String)]): org.apache.spark.sql.Column = {
    val mergeLit = array(merges.map { case (l, r) =>
      struct(lit(l).as("l"), lit(r).as("r")) }: _*)
    // size < 2 guard: sequence(1, 0) is DESCENDING in Spark, not empty
    val pairs = expr(
      """case when size(syms) < 2 then array()
        |else transform(sequence(1, size(syms) - 1),
        |  i -> struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))
        |end""".stripMargin)
    try_element_at(
      filter(mergeLit, m =>
        exists(pairs, p =>
          p.getField("l") === m.getField("l") && p.getField("r") === m.getField("r"))),
      lit(1))
  }

  /** Canonical BPE encoding (Sennrich `apply_bpe`, GPT-2/HF semantics)
    * of a (…, syms) frame: repeatedly merge all occurrences of the
    * LOWEST-rank pair present in each word (greedy left-to-right),
    * re-scanning after every application — so a later merge that
    * recreates an earlier-rank pair gets picked up, where a single
    * rank-order pass would miss it. The fixpoint loop is corpus-wide:
    * each round every word applies its own current min-rank pair (a
    * narrow columnar rewrite), and the loop ends when no word has an
    * applicable pair. Terminates because every application strictly
    * shrinks some word's symbol count; round count ≤ merges applied to
    * the longest word. Rounds materialize so lineage stays flat
    * (q91's iteration discipline). */
  def encodeSyms(wordSyms: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    if (merges.isEmpty) return wordSyms
    var cur = wordSyms
    var iter = 0
    var remaining = 1L
    while (remaining > 0) {
      require(iter < 1000, s"BPE fixpoint did not converge in $iter rounds")
      val withBest = materialize(
        cur.withColumn("best", bestMergeExpr(merges)), s"bpe_fix$iter")
      remaining = withBest.filter(col("best").isNotNull).count()
      cur = withBest
        .withColumn("syms", when(col("best").isNotNull,
            mergeFoldCol(col("syms"), col("best.l"), col("best.r")))
          .otherwise(col("syms")))
        .drop("best")
      iter += 1
    }
    cur
  }

  /** Apply learned merges to the corpus — the downstream half of
    * training, with canonical fixpoint semantics (`encodeSyms`),
    * reporting per-doc symbol counts before/after.
    *
    * Scale design: each DISTINCT word is encoded exactly once — the
    * fixpoint loop runs over the vocabulary-sized word table (Heaps'
    * law: ~10⁷-10⁸ rows at 100 TB), and the per-word segmentation
    * joins back onto the corpus word stream by equi-key (AQE
    * broadcasts it at small vocabularies). This is the word-cache
    * every production tokenizer keeps, expressed relationally; the
    * corpus itself is touched exactly once.
    *
    * No DuckDB oracle (merge application is data-dependent on q104's
    * output); TokenizerOpsSpec proves per-doc token counts equal an
    * independent canonical reference encoder, plus a direct test
    * vector where the fixpoint and one-pass-per-rank variants differ. */
  val q105BpeEncode: QueryDef = QueryDef(
    "q105_bpe_encode",
    (s, dir) => {
      val d = Tables.loadParallel(s, dir, "documents")
      val table = wordTable(d)
      val merges = bpeMergesFrom(table).map { case (l, r, _) => (l, r) }
      val vocab = encodeSyms(table.select(col("word"), col("syms")), merges)
        .select(col("word"), size(col("syms")).as("n_syms"))
      words(d).join(vocab, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(length(col("word"))).as("n_chars"),
          sum(col("n_syms")).as("n_bpe_tokens"),
          count(lit(1)).as("n_words"))
        .withColumn("compression",
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6))
        .orderBy(col("doc_id"))
    },
    None)

  val all: Seq[QueryDef] = Seq(q104BpeMerges, q105BpeEncode)
}

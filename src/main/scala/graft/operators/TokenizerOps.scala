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

  /** (word, freq, syms) — the BPE training table: distinct corpus words
    * with frequencies, each word split into single-character symbols. */
  private def wordTable(d: DataFrame): DataFrame =
    materialize(d
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", split(col("word"), "")), "bpe_words")

  /** Learn `n` BPE merges: each round counts adjacent symbol pairs
    * weighted by word frequency, picks the most frequent (ties broken
    * lexicographically), and rewrites every word's symbol array with
    * the greedy left-to-right merge. Returns (left, right, pairFreq)
    * per round, most-frequent first.
    *
    * The rewrite is a codegen'd `aggregate` fold per word — after a
    * merge the new last symbol is `l+r`, which can never equal `l`
    * again in the same pass (r is non-empty), so the fold's greedy
    * left-to-right semantics match the reference algorithm without an
    * overlap flag. */
  def bpeMerges(d: DataFrame, n: Int = NMerges): Seq[(String, String, Long)] = {
    var cur = wordTable(d)
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var round = 0
    while (round < n) {
      val top = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))""".stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) return out.toSeq
      val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      out += ((l, r, c))
      // lit()-parameterized rewrite: symbols are corpus text — never
      // spliced into an expr string
      cur = materialize(cur.withColumn("syms",
        aggregate(col("syms"), array().cast("array<string>"),
          (acc, s) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && s === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(s))))), s"bpe_round$round")
      round += 1
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

  /** Apply learned merges to the corpus — the downstream half of
    * training: every document's words are segmented with the merge
    * list in rank order (exactly how a trained BPE tokenizer encodes),
    * reporting per-doc symbol counts before/after. At scale the merge
    * list is a broadcast literal (vocab-file-sized) and encoding is a
    * narrow per-doc map — the same fold as training, applied
    * rank-by-rank.
    *
    * No DuckDB oracle (merge application is data-dependent on q104's
    * output); TokenizerOpsSpec proves per-doc token counts equal an
    * independent reference encoder. */
  val q105BpeEncode: QueryDef = QueryDef(
    "q105_bpe_encode",
    (s, dir) => {
      val d = Tables.loadParallel(s, dir, "documents")
      val merges = bpeMerges(d)
      val words = materialize(d
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(length(col("word")) >= 1)
        .withColumn("syms", split(col("word"), "")), "bpe_enc_words")
      val encoded = merges.foldLeft(words) { case (acc, (l, r, _)) =>
        acc.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"),
            (a, sym) =>
              when(size(a) > 0 &&
                  element_at(a, -1) === lit(l) && sym === lit(r),
                concat(slice(a, lit(1), size(a) - 1), array(lit(l + r))))
                .otherwise(concat(a, array(sym)))))
      }
      encoded
        .groupBy(col("doc_id"))
        .agg(sum(length(col("word"))).as("n_chars"),
          sum(size(col("syms"))).as("n_bpe_tokens"),
          count(lit(1)).as("n_words"))
        .withColumn("compression",
          round(col("n_chars").cast("double") / col("n_bpe_tokens"), 6))
        .orderBy(col("doc_id"))
    },
    None)

  val all: Seq[QueryDef] = Seq(q104BpeMerges, q105BpeEncode)
}

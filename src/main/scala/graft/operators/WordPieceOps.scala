package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training + encoding (Schuster & Nakajima 2012;
  * the BERT tokenizer, as published in the open-source reference
  * trainers): completes the tokenizer-family triple next to BPE
  * (TokenizerOps, merge by raw pair count) and Unigram-LM (UnigramOps,
  * prune by likelihood). WordPiece's distinguishing rule is the merge
  * SCORE — pair_count / (left_count · right_count), a pointwise
  * mutual-information-style ratio — so a rare pair of rare units can
  * beat a frequent pair of ubiquitous units; and its encoder is greedy
  * longest-match-first over the final vocabulary (maximum munch with
  * `##` continuation, whole-word [UNK] on failure), NOT merge replay.
  *
  * Scale design (the TokenizerOps contract): training runs on the
  * word-frequency table, never the corpus — each round is a pair-count
  * aggregate plus a unit-count aggregate over the SAME exploded frame,
  * a broadcast-joined score, one limit(1) argmax, and a narrow fold
  * rewrite, all over the vocabulary-sized table (Heaps' law keeps it
  * ~10⁷-10⁸ rows at 100 TB). Encoding touches each DISTINCT word once
  * (the word cache, relationally) with the final vocab broadcast, and
  * joins segment counts back onto the corpus word stream by equi-key.
  * The corpus is scanned exactly once per half.
  */
object WordPieceOps {

  private def materialize(df: DataFrame, tag: String): DataFrame =
    graft.Staging.materialize(df, tag, "spark.graft.corpus.stagingDir")

  private val NMerges = 8
  val Unk = "[UNK]"

  private def words(d: DataFrame): DataFrame =
    LmOps.tokenizedOf(d)
      .select(col("doc_id"), explode(col("w")).as("word"))
      .filter(length(col("word")) >= 1)

  /** WordPiece initial segmentation: first character bare, every
    * following character `##`-prefixed. */
  private[operators] val wpSyms: Column = expr(
    """transform(split(word, ''),
      |  (c, i) -> case when i = 0 then c else concat('##', c) end)""".stripMargin)

  /** (word, freq, syms) — the WordPiece training table. */
  private def wordTable(d: DataFrame): DataFrame =
    materialize(words(d)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", wpSyms), "wp_words")

  /** Strip the continuation marker from the right unit when merging:
    * merged("a", "##b") = "ab"; merged("##a", "##b") = "##ab". */
  private def mergedOf(l: Column, r: Column): Column =
    concat(l, regexp_replace(r, "^##", ""))

  /** Learn `n` WordPiece merges. Each round, over the current symbol
    * arrays weighted by word frequency: count adjacent pairs AND unit
    * occurrences from one shared explosion, score each pair
    * c / (c_l · c_r), and merge the argmax (ties broken
    * lexicographically on (l, r) — both engines' string order is
    * code-point order for the corpus alphabet). Returns
    * (left, right, merged, score) per round. */
  def wpMerges(d: DataFrame, n: Int = NMerges): Seq[(String, String, String, Double)] =
    wpMergesFrom(wordTable(d), n)

  def wpMergesFrom(table: DataFrame, n: Int = NMerges): Seq[(String, String, String, Double)] = {
    var cur = table
    val out = scala.collection.mutable.ArrayBuffer[(String, String, String, Double)]()
    var round = 0
    while (round < n) {
      val exploded = cur.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))""".stripMargin)).as("p"))
      val pairCounts = exploded
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
      // unit occurrences over ALL words (single-symbol words included —
      // they contribute to unit counts even with no pairs)
      val unitCounts = cur
        .select(col("freq"), explode(col("syms")).as("u"))
        .groupBy(col("u")).agg(sum(col("freq")).as("cu"))
      val top = pairCounts
        .join(broadcast(unitCounts.select(col("u").as("l"), col("cu").as("cl"))), Seq("l"))
        .join(broadcast(unitCounts.select(col("u").as("r"), col("cu").as("cr"))), Seq("r"))
        .withColumn("score",
          col("c").cast("double") / (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("score").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) return out.toSeq
      val (l, r) = (top(0).getAs[String]("l"), top(0).getAs[String]("r"))
      val merged = l + r.stripPrefix("##")
      out += ((l, r, merged, top(0).getAs[Double]("score")))
      round += 1
      if (round < n)
        cur = materialize(cur.withColumn("syms",
          TokenizerOps.mergeFoldColTo(col("syms"), lit(l), lit(r), lit(merged))),
          s"wp_round$round")
    }
    out.toSeq
  }

  /** The learned merge table. No DuckDB oracle (iterative,
    * data-dependent rounds); WordPieceOpsSpec proves merges equal an
    * independent canonical reference trainer — the q104 convention. */
  val q140WpMerges: QueryDef = QueryDef(
    "q140_wordpiece_merges",
    (s, dir) => {
      val merges = wpMerges(Tables.loadParallel(s, dir, "documents"))
      import scala.jdk.CollectionConverters._
      s.createDataFrame(
        merges.zipWithIndex.map { case ((l, r, m, sc), i) =>
          org.apache.spark.sql.Row(i.toLong + 1, l, r, m, sc)
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
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType, nullable = false))))
        .orderBy(col("rank"))
    },
    None)

  /** The final vocabulary: every initial unit of the corpus plus the
    * merged tokens, exactly what the published trainer emits (alphabet
    * first, then merges in rank order). */
  def wpVocab(table: DataFrame, merges: Seq[(String, String, String)]): Set[String] = {
    val alphabet = table.select(explode(wpSyms).as("u"))
      .distinct().collect().map(_.getString(0)).toSet
    alphabet ++ merges.map(_._3)
  }

  /** Canonical WordPiece encoding: greedy longest-match-first against
    * the vocabulary; non-initial pieces carry `##`; a word with no
    * matchable prefix at any position becomes one [UNK]. Driver-side
    * pure function — the single word-level step the distributed encoder
    * applies per DISTINCT word (vocab broadcast with the closure). */
  def encodeWord(word: String, vocab: Set[String]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < word.length) {
      val prefix = if (i == 0) "" else "##"
      var j = word.length
      var hit: String = null
      while (j > i && hit == null) {
        val cand = prefix + word.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      i = j
    }
    out.toSeq
  }

  /** Per-doc WordPiece token counts: train, build the vocab, encode
    * each DISTINCT word once (greedy longest match, vocab broadcast),
    * join the segmentation back onto the corpus word stream.
    *
    * No DuckDB oracle (depends on q140's learned vocab);
    * WordPieceOpsSpec pins counts against the independent reference
    * encoder — including a vector where WordPiece's score-based merge
    * choice DIFFERS from BPE's count-based choice. */
  val q141WpEncode: QueryDef = QueryDef(
    "q141_wordpiece_encode",
    (s, dir) => {
      val d = Tables.loadParallel(s, dir, "documents")
      val table = wordTable(d)
      val merges = wpMergesFrom(table).map { case (l, r, m, _) => (l, r, m) }
      val vocab = wpVocab(table, merges)
      val enc = udf((w: String) => encodeWord(w, vocab))
      val segmented = table.select(col("word"),
        enc(col("word")).as("pieces"))
        .select(col("word"), size(col("pieces")).as("n_pieces"),
          (element_at(col("pieces"), 1) === Unk).as("is_unk"))
      words(d).join(segmented, Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(length(col("word"))).as("n_chars"),
          sum(col("n_pieces")).as("n_wp_tokens"),
          sum(when(col("is_unk"), 1L).otherwise(0L)).as("n_unk_words"),
          count(lit(1)).as("n_words"))
        .withColumn("compression",
          round(col("n_chars").cast("double") / col("n_wp_tokens"), 6))
        .orderBy(col("doc_id"))
    },
    None)

  val all: Seq[QueryDef] = Seq(q140WpMerges, q141WpEncode)
}

package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the corpus-hygiene tier that the row-hash oracle can't
  * express: bloom-path equivalence to the exact anti-join, packing
  * feasibility (capacity, contiguity, conservation), redaction
  * completeness. */
class CorpusOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q84: bloom pre-filter returns EXACTLY the exact anti-join's rows") {
    val bloom = CorpusOps.q84BloomHistoryDedup.fn(spark, dir)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("file_hash"))
    val history = docs.filter(col("doc_id") % 3 === 0)
      .select(col("file_hash").as("cache_key"))
    val exact = docs.join(history, docs("file_hash") === col("cache_key"), "left_anti")
    assert(bloom.select("doc_id").collect().map(_.getLong(0)).toSet ===
      exact.select("doc_id").collect().map(_.getLong(0)).toSet)
    // false positives are possible (they just pay the exact join);
    // false NEGATIVES are not — nothing in history may survive
    val survivors = bloom.select("file_hash").collect().map(_.getString(0)).toSet
    val done = history.collect().map(_.getString(0)).toSet
    assert(survivors.intersect(done).isEmpty)
  }

  test("q86: packing respects capacity, contiguity, and conservation") {
    val bins = CorpusOps.q86SeqPack.fn(spark, dir).collect()
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    // every doc lands in exactly one bin
    assert(bins.map(_.getLong(bins.head.fieldIndex("n_docs"))).sum === nDocs)
    // a bin over capacity can only be a single oversized document
    bins.foreach { b =>
      val (n, tok) = (b.getLong(b.fieldIndex("n_docs")), b.getLong(b.fieldIndex("sum_tokens")))
      assert(tok <= 512 || n === 1, s"multi-doc bin over capacity: $b")
    }
    // bins are numbered 0..k contiguously within each source
    bins.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val ids = rows.map(_.getLong(rows.head.fieldIndex("bin"))).sorted
      assert(ids === (0L until ids.length).toArray, s"non-contiguous bins for $src")
    }
    // feasibility lower bound: a shard with no oversized bin needs at
    // least ceil(total_tokens / 512) bins
    bins.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val toks = rows.map(_.getLong(rows.head.fieldIndex("sum_tokens")))
      if (toks.forall(_ <= 512)) {
        val lower = (toks.sum + 511) / 512
        assert(rows.length >= lower, s"$src packed below the token lower bound")
      }
    }
  }

  test("q128: the audit is exactly q86's bins re-aggregated") {
    val audit = CorpusOps.q128PackAudit.fn(spark, dir).collect()
    val bins = CorpusOps.q86SeqPack.fn(spark, dir).collect()
      .groupBy(_.getString(0))
    assert(audit.nonEmpty && audit.map(_.getString(0)).distinct.length === audit.length)
    audit.foreach { a =>
      val rs = bins(a.getString(0))
      val toks = rs.map(r => r.getLong(r.fieldIndex("sum_tokens")))
      assert(a.getLong(a.fieldIndex("n_bins")) === rs.length.toLong)
      assert(a.getLong(a.fieldIndex("n_docs")) ===
        rs.map(r => r.getLong(r.fieldIndex("n_docs"))).sum)
      assert(a.getLong(a.fieldIndex("total_tokens")) === toks.sum)
      assert(a.getLong(a.fieldIndex("max_bin_tokens")) === toks.max)
      assert(a.getLong(a.fieldIndex("min_bin_tokens")) === toks.min)
      assert(a.getLong(a.fieldIndex("underfull_bins")) === toks.count(_ * 2 < 512).toLong)
      val fill = a.getDouble(a.fieldIndex("fill_rate"))
      assert(math.abs(fill - toks.sum.toDouble / (512.0 * rs.length)) < 1e-6)
      // fill is positive, and can only exceed 1.0 via single-doc
      // oversized bins (q86's capacity invariant)
      assert(fill > 0.0)
      if (fill > 1.0) assert(toks.exists(_ > 512), s"overfull without an oversized doc: $a")
    }
  }

  test("packGreedy sub-sharding spreads a single-source corpus over >1 task") {
    import spark.implicits._
    val S = 25L
    val docsList = (0L until 100L).map(id => ("cc", id, 40L + (id * 7 % 37)))
    val df = docsList.toDF("source", "doc_id", "n_tokens")

    // the de-skew claim: keyed by (source, doc_id div S), ONE source
    // lands on more than one shuffle partition — exactly the key
    // packGreedy repartitions by when docsPerSubShard is set. (AQE
    // coalescing merges these tiny test partitions back into one; at
    // scale partitions are target-sized, so disable it for the count.)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val partSizes = df
        .repartition(col("source"), expr(s"doc_id div $S"))
        .rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(partSizes.count(_ > 0) > 1,
        s"single source stayed on one task: ${partSizes.toSeq.filter(_ > 0)}")
    } finally spark.conf.set(coalesceKey, prev)

    // bins are sub-shard-local and match a driver-side greedy reference
    val got = CorpusOps.packGreedy(df, 512L, Some(S))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = docsList.groupBy(_._2 / S).toSeq.flatMap { case (sub, ds) =>
      val bins = scala.collection.mutable.ArrayBuffer[List[Long]]()
      var fill = -1L
      ds.sortBy(_._2).foreach { case (_, _, n) =>
        if (fill < 0 || fill + n > 512L) { bins += List(n); fill = n }
        else { bins(bins.length - 1) ::= n; fill += n }
      }
      bins.zipWithIndex.map { case (b, i) =>
        (sub * S + i, b.length.toLong, b.sum)
      }
    }.toSet
    assert(got === want)
    // no sub-shard can open more bins than it has docs, so ids can't
    // collide across sub-shards; with S larger than the corpus the
    // result degrades to exactly the default whole-source packing
    val whole = CorpusOps.packGreedy(df, 512L, None)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val bigS = CorpusOps.packGreedy(df, 512L, Some(1000L))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bigS === whole)
  }

  test("q83: redaction leaves no live PII and preserves surrounding text") {
    val out = CorpusOps.q83PiiRedact.fn(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(r.fieldIndex("redacted"))
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>"))
      assert(!red.matches(".*[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}.*"))
      assert(r.getLong(r.fieldIndex("n_emails")) === 1L)
      assert(r.getLong(r.fieldIndex("n_phones")) === 1L)
    }
  }

  test("q87 capstone: survivors never exceed the raw corpus, fractions stay sane") {
    val d = graft.Tables.load(spark, dir, "documents")
    val perSource = d.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = CorpusOps.q87CurationPipeline.fn(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (src, nBins, nDocs) =
        (r.getString(0), r.getLong(r.fieldIndex("n_bins")), r.getLong(r.fieldIndex("n_docs")))
      assert(nDocs <= perSource(src), s"$src emitted more docs than it has")
      assert(nBins >= 1 && nBins <= nDocs)
    }
    // the pipeline actually filters something on this corpus
    assert(out.map(_.getLong(2)).sum < d.count())
  }

  test("q88: repetition fractions live in [0,1] and dup <= 1 - 1/total") {
    val rows = CorpusOps.q88Repetition.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getLong(r.fieldIndex("total_bigrams"))
      val top = r.getDouble(r.fieldIndex("top_bigram_frac"))
      val dup = r.getDouble(r.fieldIndex("dup_bigram_frac"))
      assert(top > 0.0 && top <= 1.0)
      assert(dup >= 0.0 && dup < 1.0)
      // at least one distinct bigram exists, so dup is bounded away from 1
      assert(dup <= 1.0 - 1.0 / total + 1e-9)
    }
  }

  test("q81: injected template text is flagged as boilerplate") {
    // 4 docs sharing one 5-gram template + 1 unique doc, via a temp
    // parquet dir shaped like the documents table
    val tmp = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    import spark.implicits._
    val template = "all rights reserved by the publisher"
    Seq(
      // one-word tails: 3 shingles per doc, 2 shared → frac 2/3 ≥ 0.5
      (0L, s"$template zero", "en", "s0", 1L),
      (1L, s"$template one", "en", "s0", 1L),
      (2L, s"$template two", "en", "s0", 1L),
      (3L, s"$template three", "en", "s0", 1L),
      (4L, "completely different content with no shared fragments at all", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q81Boilerplate.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_boilerplate"))).toMap
    assert(out(0L) && out(1L) && out(2L) && out(3L), "template docs must flag")
    assert(!out(4L), "the unique doc must not flag")
  }

  test("q125: a within-site template flags; the same text spread across sites does not") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-siteboiler").toString
    val template = "subscribe to our newsletter for all the latest updates today"
    Seq(
      // template repeated 3x inside source sA → site boilerplate
      (0L, s"$template alpha", "en", "sA", 1L),
      (1L, s"$template beta", "en", "sA", 1L),
      (2L, s"$template gamma", "en", "sA", 1L),
      // same template once in each of 3 OTHER sources → not any site's template
      (3L, s"$template delta", "en", "sB", 1L),
      (4L, s"$template epsilon", "en", "sC", 1L),
      (5L, s"$template zeta", "en", "sD", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = CorpusOps.q125SourceBoilerplate.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_site_boiler"))).toMap
    assert(out(0L) && out(1L) && out(2L), "sA's repeated template must flag")
    assert(!out(3L) && !out(4L) && !out(5L),
      "cross-source spread must NOT flag (q81's global rule would)")
    // and the global rule indeed catches what the per-site rule refuses
    val global = CorpusOps.q81Boilerplate.fn(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_boilerplate"))).toMap
    assert(global(3L) && global(4L) && global(5L))
  }

  test("q125 implies q81: per-site boilerplate is a subset of global boilerplate") {
    val site = CorpusOps.q125SourceBoilerplate.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_site_boiler"))).toMap
    val global = CorpusOps.q81Boilerplate.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_boilerplate"))).toMap
    site.foreach { case (id, flagged) =>
      if (flagged) assert(global(id),
        s"doc $id is site-boiler but not global-boiler — frequent-set subset violated")
    }
  }

  test("q124: Luhn gate redacts valid cards, abstains on checksum failures") {
    val rows = CorpusOps.q124PiiLuhn.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (nc, nv) = (r.getLong(1), r.getLong(2))
      val red = r.getString(3)
      id % 3 match {
        case 0 =>
          assert(nc === 1L && nv === 1L)
          assert(red.contains("<CARD>") && !red.contains("4111111111111111"))
        case 1 =>
          // candidate found, checksum fails → counted but NOT redacted
          assert(nc === 1L && nv === 0L)
          assert(red.contains("4111111111111121") && !red.contains("<CARD>"))
        case _ =>
          assert(nc === 0L && nv === 0L && !red.contains("<CARD>"))
      }
    }
  }

  // ---- q147/q148: corpus-global line (segment) dedup --------------

  /** 10-token segments a/b/c, composed so docs share exact segments. */
  private def seg(ch: String): String = Array.fill(10)(ch).mkString(" ")

  test("q147: first occurrence survives, every later copy is cut, text reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, seg("a") + " " + seg("b")),            // a@ (1,0), b@ (1,1)
      (2L, seg("b") + " " + seg("c")),            // b duplicated -> cut
      (3L, seg("a") + " " + seg("c") + " x y z")  // a, c cut; tail 'x y z' unique
    ).toDF("doc_id", "text")
    val out = CorpusOps.lineDedupOf(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 3L, 1L)))
    assert(out(0).getString(3) === seg("a") + " " + seg("b"))
    assert(out(1).getString(3) === seg("c"))      // only its c survives
    assert(out(2).getString(3) === "x y z")       // both full segs were copies
    // conservation: kept segments across the corpus = distinct segments
    val kept = out.map(_.getLong(2)).sum
    val distinctSegs = CorpusOps.lineSegments(docs).select("h").distinct().count()
    assert(kept === distinctSegs)
  }

  test("q147: first occurrence is corpus-positional — an intra-doc repeat keeps its EARLIER index") {
    import spark.implicits._
    val docs = Seq((7L, seg("q") + " " + seg("z") + " " + seg("q"))).toDF("doc_id", "text")
    val out = CorpusOps.lineDedupOf(docs).collect().head
    assert(out.getLong(1) === 3L && out.getLong(2) === 2L)
    assert(out.getString(3) === seg("q") + " " + seg("z"))
  }

  test("q148: dup-char fraction is exact on a handcrafted corpus and removes nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, seg("a") + " " + seg("b")),  // a dup (also in doc 2), b unique
      (2L, seg("a"))                    // fully duplicated
    ).toDF("doc_id", "text")
    val out = CorpusOps.dupLineCharsOf(docs).orderBy("doc_id").collect()
    // doc 1: a has 19 chars, b has 19 -> frac = 0.5; doc 2: 1.0
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ===
      Seq((1L, 2L, 1L, 0.5), (2L, 1L, 1L, 1.0)))
  }

  test("q147/q148 agree: a doc with zero dup chars keeps every segment") {
    val dedup = CorpusOps.q147LineDedup.fn(spark, dir)
      .select(col("doc_id"), (col("kept_seg") === col("n_seg")).as("all_kept"))
    val frac = CorpusOps.q148DupLineChars.fn(spark, dir)
      .select(col("doc_id"), (col("dup_seg") === 0L).as("no_dups"))
    val joined = dedup.join(frac, Seq("doc_id")).collect()
    // no_dups -> all_kept (the converse is false: a doc can hold the
    // FIRST occurrence of a segment duplicated elsewhere)
    joined.foreach(r => assert(!r.getBoolean(2) || r.getBoolean(1)))
    assert(joined.exists(r => r.getBoolean(2)), "corpus needs clean docs")
    assert(joined.exists(r => !r.getBoolean(1)), "corpus needs cut docs")
  }

  test("q153: every span re-extracts its turn; spans ordered, disjoint, role-alternating") {
    val rows = CorpusOps.q153ChatRender.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    // the query's own aligned bit: substr(rendered, start, len) == text
    rows.foreach { r =>
      assert(r.getAs[Boolean]("aligned"),
        s"span misaligned in ${r.getAs[String]("conv_id")} turn ${r.getAs[Long]("turn_idx")}")
      assert(r.getAs[Boolean]("loss_mask") === (r.getAs[String]("role") == "assistant"))
    }
    // per conversation: turn indices dense from 0, roles alternate
    // user/assistant, spans strictly increasing and non-overlapping
    rows.groupBy(_.getAs[String]("conv_id")).foreach { case (cid, turns) =>
      val ordered = turns.sortBy(_.getAs[Long]("turn_idx"))
      assert(ordered.length <= 4, s"$cid exceeds the 4-turn grouping")
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("turn_idx") === i.toLong, s"$cid turn gap")
        val expectRole = if (i % 2 == 0) "user" else "assistant"
        assert(r.getAs[String]("role") === expectRole, s"$cid role order")
      }
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("start") + a.getAs[Long]("len") <=
            b.getAs[Long]("start"), s"$cid spans overlap")
        case _ => ()
      }
    }
    // conversation count: ceil(source size / 4) per source
    val perSource = graft.Tables.load(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val convsBySource = rows.map(_.getAs[String]("conv_id")).distinct
      .groupBy(_.split("/")(0)).view.mapValues(_.length).toMap
    perSource.foreach { case (src, n) =>
      assert(convsBySource(src) === ((n + 3) / 4).toInt, s"conv count for $src")
    }
  }

  test("q176: CDC boundaries re-synchronize after an insertion (the anti-fixed-block property)") {
    import spark.implicits._
    val base = (1 to 120).map(i => s"tok$i").mkString(" ")
    val shifted = "inserted preamble goes here " + base
    val frame = Seq((1L, "s", base), (2L, "s", shifted))
      .toDF("doc_id", "source", "text")
    val chunks = CorpusOps.cdcChunksOf(frame).collect()
      .groupBy(_.getLong(0))
    val h1 = chunks(1L).map(_.getString(3)).toSet
    val h2 = chunks(2L).map(_.getString(3)).toSet
    // content-defined cuts: after at most one disturbed chunk at the
    // head, the shifted doc re-aligns and shares the original's chunks
    val shared = (h1 intersect h2).size
    assert(shared >= h1.size - 2,
      s"only $shared of ${h1.size} base chunks survive a 4-token insertion")
    // fixed-size blocks would share none: prove the baseline fails
    def fixedBlocks(text: String): Set[String] =
      text.split(" ").grouped(8).map(_.mkString(" ")).toSet
    assert((fixedBlocks(base) intersect fixedBlocks(shifted)).isEmpty,
      "fixed blocks must all shift under the same insertion (else the comparison is vacuous)")
    // chunks tile each doc exactly
    chunks.foreach { case (id, cs) =>
      val total = cs.map(_.getLong(4)).sum
      val n = frame.filter(col("doc_id") === id)
        .select(size(split(trim(col("text")), "\\s+"))).head().getInt(0)
      assert(total === n.toLong, s"doc $id chunks must tile the token stream")
    }
  }

  test("q178: substituting each sentinel's span back reconstructs the original text") {
    val originals = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").mkString(" "))
      .toMap
    val rows = CorpusOps.q178SpanCorruption.fn(spark, dir).collect()
    assert(rows.length === originals.size)
    var masked = 0L; var total = 0L
    rows.foreach { r =>
      val (id, nTok, nMask) = (r.getLong(0), r.getLong(1), r.getLong(2))
      total += nTok; masked += nMask
      // parse the target into sentinel -> span text
      val spans = scala.collection.mutable.Map[String, List[String]]()
      var cur: String = null
      r.getString(4).split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) { cur = t; spans(cur) = Nil }
        else spans(cur) = spans(cur) :+ t
      }
      val rebuilt = r.getString(3).split(" ").flatMap { t =>
        if (t.startsWith("<extra_id_")) spans(t) else List(t)
      }.mkString(" ")
      assert(rebuilt === originals(id), s"doc $id round-trip")
      assert(nMask <= nTok)
    }
    // realized mask rate near the 15% target (binomial over triplets)
    val rate = masked.toDouble / total
    assert(rate > 0.10 && rate < 0.20, s"mask rate $rate far from 0.15")
  }

  test("q185: PSM reordering round-trips to the original token stream; FIM rate ~50%") {
    val originals = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").mkString(" "))
      .toMap
    val rows = CorpusOps.q185Fim.fn(spark, dir).collect()
    assert(rows.length === originals.size)
    var fimCount = 0
    rows.foreach { r =>
      val (id, fim, rendered) = (r.getLong(0), r.getBoolean(2), r.getString(3))
      if (!fim) assert(rendered === originals(id), s"doc $id passthrough")
      else {
        fimCount += 1
        // undo PSM: <PRE> p <SUF> s <MID> m  →  p m s
        val pre = rendered.stripPrefix("<PRE> ")
        val Array(p, rest) = pre.split(" <SUF> ", 2)
        val Array(sfx, mid) = rest.split(" <MID> ", 2)
        val toks = (p.split(" ").filter(_.nonEmpty) ++
          mid.split(" ").filter(_.nonEmpty) ++
          sfx.split(" ").filter(_.nonEmpty)).mkString(" ")
        assert(toks === originals(id), s"doc $id round-trip")
        // prefix and suffix are never empty by the cut-point bounds
        assert(p.nonEmpty && sfx.nonEmpty, s"doc $id empty prefix/suffix")
      }
    }
    val rate = fimCount.toDouble / rows.length
    assert(rate > 0.35 && rate < 0.65, s"FIM rate $rate far from the 50% target")
  }
}

package graft.operators

import graft.{QueryDef, Tables}
import graft.tools.Media
import org.apache.spark.sql.functions._

/** Multimodal-tier oracle query: audio features through the REAL WAV
  * codec. Each document's text deterministically generates PCM16
  * samples (one per code point), the bytes go through buildWav →
  * decodeWav — RIFF header, chunk walk, bit-exact PCM — and the
  * extracted duration/RMS/peak must match the oracle computing the
  * same sample math directly in SQL. The binary round trip happens
  * only on the Spark side (DuckDB parses no WAV); any header or
  * sample-codec bug breaks the hash match, exactly the q29 pattern.
  *
  * Scale: one build+decode per row, a pure narrow map — audio bytes
  * never leave the partition.
  */
object MediaOps {

  private val MaxSamples = 200
  private val Rate = 16000

  val q69WavFeatures: QueryDef = QueryDef(
    "q69_wav_features",
    (s, dir) => {
      val docs = Tables.loadParallel(s, dir, "documents")
      val viaWav = udf { (t: String) =>
        if (t == null || t.isEmpty) null
        else {
          // one sample per code point: ((cp % 128) * 200 - 12800)
          val cps = t.codePoints().toArray.take(MaxSamples)
          val samples = cps.map(cp => ((cp % 128) * 200 - 12800).toShort)
          val a = Media.decodeWav(Media.buildWav(samples, Rate))
          (a.samples.length, a.durationMs,
            BigDecimal(a.rms).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            BigDecimal(a.peak).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      docs.select(col("doc_id"), viaWav(col("text")).as("x"))
        .select(col("doc_id"),
          col("x._1").as("n_samples"),
          col("x._2").as("duration_ms"),
          col("x._3").as("rms"),
          col("x._4").as("peak"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH s AS (SELECT doc_id, length(text) AS n_chars,
        [ (unicode(c) % 128) * 200 - 12800
          for c in regexp_split_to_array(substr(text, 1, $MaxSamples), '') ] AS v
      FROM documents)
      SELECT doc_id,
        CASE WHEN n_chars > 0 THEN CAST(len(v) AS INT) END AS n_samples,
        CASE WHEN n_chars > 0 THEN CAST(len(v) * 1000 // $Rate AS BIGINT) END AS duration_ms,
        CASE WHEN n_chars > 0 THEN
          round(sqrt(list_sum(list_transform(v, x -> CAST(x AS DOUBLE) * x)) / len(v)) / 32768.0, 6)
        END AS rms,
        CASE WHEN n_chars > 0 THEN
          round(list_aggregate(list_transform(v, x -> abs(x)), 'max') / 32768.0, 6)
        END AS peak
      FROM s ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q69WavFeatures)
}

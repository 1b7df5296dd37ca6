package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL interchange: round-trip fidelity, malformed-line quarantine,
  * compressed round-trip. */
class JsonlCorpusSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private def docs = graft.Tables.load(spark, dir, "documents")

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-jsonl").toString

  test("write → read round-trips the documents table exactly") {
    val out = s"${tmp()}/corpus"
    JsonlCorpus.write(docs, out)
    val r = JsonlCorpus.read(spark, out, schema)
    assert(r.quarantine.count() === 0L)
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = r.good.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toString)
    assert(b.toSeq === a.toSeq)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    r.release()
    assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore - 1,
      "release() must drop the shared parsed frame from storage")
  }

  test("gzip round-trip preserves content") {
    val out = s"${tmp()}/corpus_gz"
    JsonlCorpus.write(docs, out, compression = "gzip")
    assert(new java.io.File(out).listFiles().exists(_.getName.endsWith(".gz")))
    val r = JsonlCorpus.read(spark, out, schema)
    assert(r.quarantine.count() === 0L)
    assert(r.good.count() === docs.count())
    r.release()
  }

  test("malformed lines quarantine raw; good lines parse untouched") {
    val out = tmp()
    val f = new java.io.PrintWriter(s"$out/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "ok one", "lang": "en", "source": "s", "n_chars": 6}""")
    f.println("""{"doc_id": oops not json""")
    f.println("""{"doc_id": 2, "text": "ok two", "lang": "en", "source": "s", "n_chars": 6}""")
    f.println("""{"doc_id": "NOT_A_NUMBER", "text": "bad type", "lang": "en", "source": "s", "n_chars": 1}""")
    f.close()
    val r = JsonlCorpus.read(spark, out, schema)
    val (good, bad) = (r.good, r.quarantine)
    assert(good.count() === 2L)
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val raw = bad.collect().map(_.getString(0))
    assert(raw.length === 2)
    assert(raw.exists(_.contains("oops not json")))
    assert(raw.exists(_.contains("NOT_A_NUMBER")), "type violations quarantine too")
    r.release()
  }
}

package graft.pipeline

import graft.SparkSpec
import graft.functions.JsonRepair
import org.apache.spark.sql.functions._

class ToolsAndTemplatesSpec extends SparkSpec {

  test("Templates: static, custom_data, legacy forms") {
    assert(Templates.renderStatic("total is {{total}} for {{who}}",
      Map("total" -> "42", "who" -> "acme")) == "total is 42 for acme")
    // unknown vars survive
    assert(Templates.renderStatic("keep {{unknown}}", Map()) == "keep {{unknown}}")
    assert(Templates.renderLegacy("x %v% y", Map("v" -> "1")) == "x 1 y")

    import spark.implicits._
    val df = Seq(("inv-1", "acme"), ("inv-2", "bob inc")).toDF("id", "customer")
      .withColumn("custom_data", struct(col("customer")))
    val got = df.select(Templates.renderColumn(
      "Customer {{custom_data.customer}} owes {{amount}}.",
      Map("amount" -> "$5"), Some(col("custom_data"))).as("p"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("Customer acme owes $5.", "Customer bob inc owes $5."))
  }

  test("Templates: dynamic {{url [var]}} replacement with canned transport") {
    val fetched = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val fetch = (url: String, payload: String) => {
      fetched += (url -> payload); s"enriched($payload)"
    }
    val prompt = "Context: {{https://api.example.com/lookup [vendor]}} end."
    val got = Templates.replaceDynamic(prompt, Map("vendor" -> "acme"), fetch)
    assert(got == "Context: enriched(acme) end.")
    assert(fetched.toSeq == Seq("https://api.example.com/lookup" -> "acme"))

    // referenced prompt output missing → placeholder survives, no call
    fetched.clear()
    val kept = Templates.replaceDynamic(prompt, Map("other" -> "x"), fetch)
    assert(kept == prompt && fetched.isEmpty)

    // static variables pass through untouched by the dynamic pass
    assert(Templates.replaceDynamic("plain {{total}}", Map("total" -> "1"), fetch)
      == "plain {{total}}")
  }

  test("Templates: dynamic replacement SSRF guard rejects non-https and metadata hosts") {
    val fetch = (_: String, _: String) => fail("transport must not be called")
    Seq(
      "{{http://api.example.com/x [v]}}",          // plain http
      "{{https://169.254.169.254/latest [v]}}",    // link-local metadata
      "{{https://localhost/x [v]}}").foreach { p =>
      intercept[SecurityException](
        Templates.replaceDynamic(p, Map("v" -> "x"), fetch))
    }
  }

  test("Templates: dynamic UDF replaces per row and is non-deterministic") {
    import spark.implicits._
    val df = Seq(
      ("Vendor: {{https://api.example.com/v [vendor]}}", Map("vendor" -> "acme")),
      ("Vendor: {{https://api.example.com/v [vendor]}}", Map.empty[String, String]))
      .toDF("prompt", "outputs")
    val u = Templates.dynamicReplaceUdf(() => (_: String, p: String) => s"<$p>")
    val got = df.select(u(col("prompt"), col("outputs")).as("p"))
      .as[String].collect()
    assert(got(0) == "Vendor: <acme>")
    assert(got(1) == "Vendor: {{https://api.example.com/v [vendor]}}")
    assert(!u.deterministic)
  }

  test("JsonRepair: repair is the identity on valid compact JSON (property)") {
    import org.scalacheck.Gen
    val key = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val value = Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(_.toString),
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(s => "\"" + s.mkString + "\""),
      Gen.oneOf("true", "false", "null"))
    forAll(key, value) { (k, v) =>
      val json = s"""{"$k": $v, "nested": {"arr": [1, 2, $v]}}"""
      assert(JsonRepair.repair(json) == json, s"repair mangled valid JSON: $json")
    }
  }

  test("TableExtractorTool: directory-merged table, per-dir row ids, error isolation") {
    import spark.implicits._
    val df = Seq(
      ("dirA", "f1.txt", "join join agg"),
      ("dirA", "f2.txt", "scan"),
      ("dirB", "f3.txt", "agg agg agg"),
      ("dirB", "f4.txt", null.asInstanceOf[String]))   // failed extraction
      .toDF("source", "file_name", "text")
    val got = TableExtractorTool(df, Map.empty)
      .orderBy("source", "table_row")
      .select("source", "file_name", "word", "cnt", "table_row", "error_message")
      .collect()
    // dirA: 2 files × 3 words = 6 rows numbered 1..6 within the directory
    val dirA = got.filter(_.getString(0) == "dirA")
    assert(dirA.map(_.getInt(4)).toSeq == (1 to 6))
    assert(dirA.head.getString(1) == "f1.txt" && dirA.head.getString(2) == "agg"
      && dirA.head.getLong(3) == 1L)
    // dirB numbering restarts at 1 (window partitioned by directory)
    val dirB = got.filter(_.getString(0) == "dirB")
    assert(dirB.map(_.getInt(4)).toSeq == (1 to 6))
    // the null-text file becomes error rows, job still succeeds
    val failed = got.filter(r => r.getString(1) == "f4.txt")
    assert(failed.length == 3 && failed.forall(r =>
      r.isNullAt(3) && r.getString(5).startsWith("table_extract_failed")))
    assert(graft.pipeline.ToolRegistry.get("table_extractor").contains(TableExtractorTool))
  }

  test("JsonRepair: markers, fences, quotes, trailing commas, unquoted keys") {
    assert(JsonRepair.repair("""§§§{"a": 1}§§§""") == """{"a": 1}""")
    assert(JsonRepair.repair("```json\n{\"a\": 2}\n```") == """{"a": 2}""")
    assert(JsonRepair.repair("""{'a': 'x'}""") == """{"a": "x"}""")
    assert(JsonRepair.repair("""{a: 1, b: 2,}""") == """{"a": 1, "b": 2}""")
    assert(JsonRepair.repair("""noise before [1, 2, 3,] noise after""") == "[1, 2, 3]")
    assert(JsonRepair.repair("no json here") == null)

    import spark.implicits._
    val df = Seq("""prefix {'total': 12.5, count: 3,} suffix""", "garbage").toDF("raw")
    val got = df.select(JsonRepair.parseWithRepair(col("raw"),
      "total DOUBLE, count INT").as("j"))
    val rows = got.collect()
    assert(rows(0).getStruct(0).getDouble(0) == 12.5)
    assert(rows(0).getStruct(0).getInt(1) == 3)
    assert(rows(1).isNullAt(0))
  }

  test("ToolRegistry: classifier, text extractor, lookup enrichment") {
    import spark.implicits._
    assert(ToolRegistry.list ==
      Seq("classifier", "lookup_enrichment", "table_extractor", "text_extractor"))

    val docs = Seq(
      (1L, "join join agg", "en"),
      (2L, "scan scan scan agg", "de"),
      (3L, "nothing relevant", "xx")).toDF("doc_id", "text", "lang")

    val classified = ToolRegistry.get("classifier").get(docs, Map())
      .select("doc_id", "classification").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(classified(1L) == "joins")
    assert(classified(2L) == "scans")
    assert(classified(3L) == "unknown")

    val enriched = ToolRegistry.get("lookup_enrichment").get(docs, Map("field" -> "lang"))
      .select("doc_id", "lang_enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(enriched(1L).contains("English"))
    assert(enriched(3L).isEmpty)                     // not in reference corpus

    val binary = Seq((1L, "hello bytes".getBytes)).toDF("doc_id", "content")
    val text = ToolRegistry.get("text_extractor").get(binary, Map())
      .select("text").collect().head.getString(0)
    assert(text == "hello bytes")
  }
}

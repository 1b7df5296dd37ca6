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
    assert(ToolRegistry.list == Seq("classifier", "lookup_enrichment", "text_extractor"))

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

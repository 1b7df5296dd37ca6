package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Text-density extraction semantics beyond the q190 oracle: the
  * content survives byte-exact, the injected chrome never leaks, and
  * the density rule (not luck) is what rejects the link-heavy blocks. */
class HtmlOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q190: every document extracts byte-exact; nav/footer text never leaks") {
    val rows = HtmlOps.q190HtmlExtract.fn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"doc ${r.getLong(0)} not cleanly extracted")
      val extracted = r.getString(3)
      // the synthesized chrome's distinctive strings must not survive
      Seq("Home", "About", "Contact", "Terms", "Privacy", "(c)").foreach { w =>
        assert(!extracted.contains(w), s"chrome token '$w' leaked into doc ${r.getLong(0)}")
      }
      // exactly one block (the content paragraph) is kept
      assert(r.getLong(2) === 1L, s"doc ${r.getLong(0)} kept ${r.getLong(2)} blocks")
    }
  }
}

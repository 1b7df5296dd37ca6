package graft.tools

import graft.SparkSpec
import graft.pipeline.{TextExtractorTool, ToolRegistry}
import graft.sources.FileScan
import org.apache.spark.sql.functions._

/** D1 text extraction: the PDF writer/extractor pair and its wiring into
  * TextExtractorTool and FileScan (mime sniff → adapter dispatch). */
class PdfSpec extends SparkSpec {

  test("round trip: plain ASCII text, compressed stream") {
    val t = "key agg row scan slow fast table value part hash " * 20
    val d = Pdf.extract(Pdf.build(t))
    assert(d.text == t)
    assert(d.nPages == math.ceil(math.ceil(t.length / 80.0) / 40.0).toInt)
    assert(d.lines.size == math.ceil(t.length / 80.0).toInt)
  }

  test("round trip: PDF string specials, newlines, tabs, unicode") {
    val t = "parens () and \\backslash\\ and\nnewlines\r\n\ttabs héllo ✓ émojis é"
    assert(Pdf.extract(Pdf.build(t)).text == t)
  }

  test("round trip: astral char straddling the wrap column") {
    // 😀 is a surrogate pair; with UTF-16-unit wrapping the pair would be
    // cut at column 80 and each half encoded as '?'. Wrapping is on code
    // points, so the pair stays together and the round trip is exact.
    val t = "a" * 79 + "😀" + "b" * 10
    val d = Pdf.extract(Pdf.build(t))
    assert(d.text == t)
    // 90 code points → 2 lines of ≤80 code points
    assert(d.lines.size == 2)
    assert(d.lines.head.text.codePointCount(0, d.lines.head.text.length) == 80)
  }

  test("round trip: empty text, single char, exact page boundary") {
    assert(Pdf.extract(Pdf.build("")).text == "")
    assert(Pdf.extract(Pdf.build("x")).text == "x")
    val boundary = "a" * (80 * 40) // exactly one full page
    val d = Pdf.extract(Pdf.build(boundary))
    assert(d.text == boundary && d.nPages == 1)
    val over = "a" * (80 * 40 + 1)
    assert(Pdf.extract(Pdf.build(over)).nPages == 2)
  }

  test("round trip: uncompressed stream + page/line metadata") {
    val t = ("0123456789" * 8) * 3 + "tail" // 3 full lines + 1 short
    val d = Pdf.extract(Pdf.build(t, compress = false))
    assert(d.text == t)
    assert(d.lines.map(_.text) == Seq("0123456789" * 8, "0123456789" * 8,
      "0123456789" * 8, "tail"))
    assert(d.pages == Seq(Pdf.PdfPage(1, 4, t.length)))
    assert(d.layoutText == d.lines.map(_.text).mkString("\n"))
  }

  test("extracts third-party-shaped PDFs: TJ arrays, hex strings, quote ops") {
    // hand-written minimal PDF exercising operators our writer never emits
    val content =
      "BT /F1 12 Tf 72 720 Td [(Hel) -30 (lo )] TJ <776F726C64> Tj T* (next line) ' ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")
    val d = Pdf.extract(pdf)
    assert(d.nPages == 1)
    assert(d.lines.map(_.text) == Seq("Hello ", "world", "next line"))
  }

  test("round trip: property — random unicode text survives build+extract exactly") {
    import org.scalacheck.Gen
    // mixes ASCII, PDF specials, CJK, combining marks, and astral chars
    val charGen = Gen.frequency(
      8 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('(', ')', '\\', '\n', '\t', '\r'),
      2 -> Gen.oneOf('é', '✓', '漢', '字', '́'),
      1 -> Gen.const('\uD83D'))  // replaced below to keep pairs valid
    val textGen = Gen.chooseNum(0, 400).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString.replace("\uD83D", "😀")) // lone high → 😀
    forAll(textGen) { t =>
      assert(Pdf.extract(Pdf.build(t)).text == t, s"round trip failed for ${t.take(60)}")
    }
  }

  test("TextExtractorTool: pdf adapter extracts, no_op passes through") {
    import spark.implicits._
    val text = "invoice total 123.45 due 2024-05-01"
    val rows = Seq(
      ("a.pdf", Pdf.build(text)),
      ("b.txt", "plain bytes".getBytes("UTF-8")))
      .toDF("file_name", "content")
    val got = TextExtractorTool(rows, Map.empty)
      .select("file_name", "text", "n_pages").orderBy("file_name")
      .as[(String, String, Int)].collect()
    assert(got(0) == (("a.pdf", text, 1)))
    assert(got(1) == (("b.txt", "plain bytes", 1)))

    val noop = TextExtractorTool(rows, Map("adapter" -> "no_op"))
      .filter($"file_name" === "b.txt").select("text").as[String].collect()
    assert(noop.toSeq == Seq("plain bytes"))
    assert(ToolRegistry.get("text_extractor").contains(TextExtractorTool))
  }

  test("TextExtractorTool: corrupt PDF yields an error row, not a failed job") {
    import spark.implicits._
    // corrupt the deflate payload in place: objects still parse, but
    // FlateDecode throws (the realistic bit-rot / bad-upload shape)
    val corrupt = Pdf.build("some document text " * 50)
    val at = new String(corrupt, "ISO-8859-1").indexOf("stream\n") + "stream\n".length
    (at until at + 20).foreach(corrupt(_) = 0)
    val rows = Seq(
      ("good.pdf", Pdf.build("fine")),
      ("bad.pdf", corrupt))
      .toDF("file_name", "content")
    val got = TextExtractorTool(rows, Map.empty)
      .select("file_name", "text", "error_message").orderBy("file_name")
      .as[(String, String, String)].collect()
    assert(got(0)._1 == "bad.pdf" && got(0)._2 == null && got(0)._3 != null)
    assert(got(0)._3.startsWith("extract_failed:"))
    assert(got(1) == (("good.pdf", "fine", null)))
  }

  test("end-to-end: scan a dir of PDFs, sniff mime, extract text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf").toFile
    val texts = Map("doc1" -> ("alpha beta " * 30), "doc2" -> "short doc")
    texts.foreach { case (n, t) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"$n.pdf").toPath, Pdf.build(t))
    }
    val scanned = FileScan.scan(spark, FileScan.ScanConfig(dir.getAbsolutePath))
    val mimes = scanned.select("mime_type").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(mimes == Seq("application/pdf"))
    val extracted = TextExtractorTool(scanned, Map.empty)
      .select(col("file_name"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(extracted == texts.map { case (n, t) => (s"$n.pdf", t) })
  }
}

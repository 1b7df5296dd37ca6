package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable

/** Minimal PDF writer + text extractor (SURVEY.md D1, EXTRACT/x2text).
  *
  * The reference's x2text tier converts binary documents to text via
  * external services (llm_whisperer, unstructured, llama_parse —
  * sdk1/adapters/x2text/, legacy_executor.py:189-321). This sandbox has
  * no such services and no PDF jars, so the adapter is implemented
  * against the PDF spec directly with the JDK only:
  *
  *  - `build`: deterministic text → PDF (Helvetica, fixed wrap width,
  *    Flate-compressed content streams) — the test-fixture generator.
  *  - `extract`: xref-free object scan → per-page content streams →
  *    FlateDecode (java.util.zip.Inflater) → BT/ET text-operator
  *    tokenizer (Tj, TJ, ', ", literal + hex strings, escape sequences).
  *
  * Contract: `extract(...).text` is the exact concatenation of the
  * string-show operands (PDF has no semantic newlines — layout is
  * reported per line in `lines`, not injected into `text`), so
  * `extract(build(t)).text == t` for any input, and third-party simple
  * PDFs (uncompressed or Flate, literal /Length) extract faithfully.
  */
object Pdf {

  /** Per-line layout metadata (the highlight-data analog, D1). */
  final case class PdfLine(page: Int, line: Int, text: String)
  final case class PdfPage(page: Int, n_lines: Int, n_chars: Int)
  final case class PdfDoc(nPages: Int, text: String, lines: Seq[PdfLine]) {
    def pages: Seq[PdfPage] =
      lines.groupBy(_.page).toSeq.sortBy(_._1).map { case (p, ls) =>
        PdfPage(p, ls.size, ls.map(_.text.length).sum)
      }
    /** Layout-preserving view: one physical line per text row. */
    def layoutText: String = lines.map(_.text).mkString("\n")
  }

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  // ---------------------------------------------------------------- build

  /** Escape a text chunk into a PDF literal string body. */
  private def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '('  => b.append("\\(")
      case ')'  => b.append("\\)")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\${c.toInt}%03o")
      case c => b.append(c)
    }
    b.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 4 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new IllegalArgumentException("truncated FlateDecode stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Hard-wrap on CODE POINTS, not UTF-16 units: splitting a surrogate
    * pair at a wrap boundary would UTF-8-encode each half as '?' and
    * break the exact round-trip contract for astral characters. */
  private def wrapCodePoints(text: String, width: Int): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var i = 0
    while (i < text.length) {
      val end =
        try text.offsetByCodePoints(i, width)
        catch { case _: IndexOutOfBoundsException => text.length }
      out += text.substring(i, end)
      i = end
    }
    out.toSeq
  }

  /** Deterministic text → PDF: hard-wrap into `charsPerLine` chunks,
    * `linesPerPage` rows per page. Chunking adds no separators, so the
    * concatenation of all string operands reproduces the input exactly. */
  def build(text: String, charsPerLine: Int = 80, linesPerPage: Int = 40,
      compress: Boolean = true): Array[Byte] = {
    val lines =
      if (text.isEmpty) Seq("") else wrapCodePoints(text, charsPerLine)
    val pages = lines.grouped(linesPerPage).toSeq
    val nPages = pages.size

    // object numbering: 1 catalog, 2 pages, 3 font, then (page, content)
    // pairs: page i (0-based) → obj 4+2i, its content stream → obj 5+2i
    val pageObjNums = (0 until nPages).map(4 + 2 * _)
    val objects = mutable.ArrayBuffer[(Int, Array[Byte])]()
    objects += 1 -> "<< /Type /Catalog /Pages 2 0 R >>".getBytes(ISO_8859_1)
    objects += 2 -> s"<< /Type /Pages /Kids [${pageObjNums.map(n => s"$n 0 R").mkString(" ")}] /Count $nPages >>"
      .getBytes(ISO_8859_1)
    objects += 3 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
      .getBytes(ISO_8859_1)
    pages.zipWithIndex.foreach { case (pageLines, i) =>
      objects += (4 + 2 * i) ->
        (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
          .getBytes(ISO_8859_1)
      val shows = pageLines.zipWithIndex.map { case (l, j) =>
        (if (j == 0) "" else "T*\n") + s"(${escape(l)}) Tj\n"
      }.mkString
      val content = s"BT\n/F1 12 Tf\n14 TL\n72 756 Td\n${shows}ET\n"
        .getBytes(UTF_8)
      val (data, filter) =
        if (compress) (deflate(content), " /Filter /FlateDecode") else (content, "")
      val head = s"<< /Length ${data.length}$filter >>\nstream\n".getBytes(ISO_8859_1)
      val tail = "\nendstream".getBytes(ISO_8859_1)
      objects += (5 + 2 * i) -> (head ++ data ++ tail)
    }

    val out = new ByteArrayOutputStream(4096)
    out.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    val offsets = mutable.Map[Int, Int]()
    objects.foreach { case (n, body) =>
      offsets(n) = out.size()
      out.write(s"$n 0 obj\n".getBytes(ISO_8859_1))
      out.write(body)
      out.write("\nendobj\n".getBytes(ISO_8859_1))
    }
    val xrefAt = out.size()
    val nObjs = objects.size + 1
    val xref = new StringBuilder(s"xref\n0 $nObjs\n0000000000 65535 f \n")
    (1 until nObjs).foreach { n =>
      xref.append(f"${offsets(n)}%010d 00000 n \n")
    }
    xref.append(s"trailer\n<< /Size $nObjs /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.write(xref.toString.getBytes(ISO_8859_1))
    out.toByteArray
  }

  // -------------------------------------------------------------- extract

  private final case class PdfObj(num: Int, dict: String, data: Option[Array[Byte]])

  /** Scan-based object parser: tolerant of missing/garbled xref (reads
    * every `N 0 obj … endobj` span directly), uses literal /Length when
    * present and falls back to the endstream keyword otherwise. */
  private def parseObjects(bytes: Array[Byte]): Seq[PdfObj] = {
    val s = new String(bytes, ISO_8859_1)
    val objPat = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+obj\\b")
    val lenPat = java.util.regex.Pattern.compile("/Length\\s+(\\d+)\\b")
    val objs = mutable.ArrayBuffer[PdfObj]()
    val m = objPat.matcher(s)
    var pos = 0
    while (pos < s.length && m.find(pos)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val endobjIdx = s.indexOf("endobj", bodyStart)
      if (endobjIdx < 0) { pos = s.length }
      else {
        val streamIdx = s.indexOf("stream", bodyStart)
        if (streamIdx >= 0 && streamIdx < endobjIdx) {
          val dict = s.substring(bodyStart, streamIdx)
          var dataStart = streamIdx + "stream".length
          if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
          if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
          val lm = lenPat.matcher(dict)
          val dataEnd =
            if (lm.find()) math.min(dataStart + lm.group(1).toInt, s.length)
            else math.max(s.indexOf("endstream", dataStart), dataStart)
          val raw = bytes.slice(dataStart, dataEnd)
          val data = if (dict.contains("/FlateDecode")) inflate(raw) else raw
          objs += PdfObj(num, dict, Some(data))
          val realEnd = s.indexOf("endobj", dataEnd)
          pos = if (realEnd < 0) s.length else realEnd + "endobj".length
        } else {
          objs += PdfObj(num, s.substring(bodyStart, endobjIdx), None)
          pos = endobjIdx + "endobj".length
        }
      }
    }
    objs.toSeq
  }

  /** Tokenize a content stream: literal `(…)` strings (escapes, nested
    * parens, line continuations), hex `<…>` strings, and the show
    * operators Tj / TJ / ' / ". Each show = one layout line. */
  private def showsOf(content: Array[Byte]): Seq[String] = {
    val s = new String(content, ISO_8859_1)
    val shows = mutable.ArrayBuffer[String]()
    var pending = mutable.ArrayBuffer[String]() // strings since last operator
    var i = 0
    def parseLiteral(): String = {
      // at s(i) == '('
      val b = new ByteArrayOutputStream()
      var depth = 1
      i += 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'n' => b.write('\n'); i += 2
              case 'r' => b.write('\r'); i += 2
              case 't' => b.write('\t'); i += 2
              case 'b' => b.write('\b'); i += 2
              case 'f' => b.write('\f'); i += 2
              case '\n' => i += 2 // line continuation
              case '\r' =>
                i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var oct = 0; var k = 0; i += 1
                while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  oct = oct * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                }
                b.write(oct & 0xff)
              case c => b.write(c.toInt); i += 2
            }
          case '(' => depth += 1; b.write('('); i += 1
          case ')' =>
            depth -= 1; if (depth > 0) b.write(')'); i += 1
          case c => b.write(c.toInt & 0xff); i += 1
        }
      }
      new String(b.toByteArray, UTF_8)
    }
    def parseHex(): String = {
      // at s(i) == '<' (not '<<')
      val b = new ByteArrayOutputStream()
      i += 1
      val hex = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (!c.isWhitespace) hex.append(c)
        i += 1
      }
      i += 1
      val padded = if (hex.length % 2 == 1) hex.append('0') else hex
      padded.toString.grouped(2).foreach(h => b.write(Integer.parseInt(h, 16)))
      new String(b.toByteArray, UTF_8)
    }
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => pending += parseLiteral()
        case '<' if i + 1 < s.length && s.charAt(i + 1) != '<' =>
          pending += parseHex()
        case c if c.isLetter || c == '\'' || c == '"' =>
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
            s.charAt(i) != '(' && s.charAt(i) != '<' &&
            s.charAt(i) != '[' && s.charAt(i) != ']') i += 1
          val op = s.substring(start, i)
          op match {
            case "Tj" | "TJ" | "'" | "\"" =>
              if (pending.nonEmpty) { shows += pending.mkString; pending.clear() }
            case _ => pending.clear() // strings consumed by non-show ops
          }
        case _ => i += 1
      }
    }
    shows.toSeq
  }

  /** Extract text + per-line layout from a PDF byte array. */
  def extract(bytes: Array[Byte]): PdfDoc = {
    require(isPdf(bytes), "not a PDF (missing %PDF header)")
    val objs = parseObjects(bytes)
    val byNum = objs.map(o => o.num -> o).toMap
    val pagePat = java.util.regex.Pattern.compile("/Type\\s*/Page\\b")
    val contentsPat = java.util.regex.Pattern.compile("/Contents\\s+(\\d+)\\s+0\\s+R")
    val pageObjs = objs.filter(o => o.data.isEmpty && pagePat.matcher(o.dict).find())
    // pages in document order; content = referenced stream, or the page's
    // own stream for writers that inline it
    val pageContents: Seq[Array[Byte]] = pageObjs.map { p =>
      val cm = contentsPat.matcher(p.dict)
      if (cm.find()) byNum.get(cm.group(1).toInt).flatMap(_.data).getOrElse(Array.emptyByteArray)
      else Array.emptyByteArray
    }
    val lines = pageContents.zipWithIndex.flatMap { case (c, pi) =>
      showsOf(c).zipWithIndex.map { case (t, li) => PdfLine(pi + 1, li + 1, t) }
    }
    PdfDoc(pageObjs.size, lines.map(_.text).mkString, lines)
  }
}

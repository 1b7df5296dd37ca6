package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

class TextFunctionsSpec extends SparkSpec {
  import TextFunctions._

  test("globToRegex basics") {
    assert("invoice_01.pdf".matches(globToRegex("*.pdf")))
    assert(!"invoice_01.pdfx".matches(globToRegex("*.pdf")))
    assert("a.txt".matches(globToRegex("?.txt")))
    assert(!"ab.txt".matches(globToRegex("?.txt")))
    assert("file[1].txt".matches(globToRegex("file[[]1].txt")))
    assert("fileA.txt".matches(globToRegex("file[AB].txt")))
    assert(!"fileC.txt".matches(globToRegex("file[AB].txt")))
    assert("fileC.txt".matches(globToRegex("file[!AB].txt")))
  }

  test("globToRegex: literal pattern matches itself (property)") {
    val lit = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forAll(lit) { s => assert(s.matches(globToRegex(s))) }
  }

  test("glob * matches any suffix (property)") {
    val lit = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    forAll(lit, lit) { (a, b) => assert((a + b).matches(globToRegex(a + "*"))) }
  }

  test("globToRegex agrees with java.nio glob matching (property)") {
    // random names vs random globs over a bracket-free alphabet — both
    // matchers must agree on every pair (PathMatcher is the independent
    // spec for fnmatch-style basename globs)
    val nameGen = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 1 -> Gen.const('.'), 1 -> Gen.const('_'))))
      .map(_.mkString)
    val globGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.frequency(
        4 -> Gen.alphaNumChar, 2 -> Gen.const('*'), 1 -> Gen.const('?'),
        1 -> Gen.const('.'))))
      .map(_.mkString)
    val fsys = java.nio.file.FileSystems.getDefault
    forAll(nameGen, globGen) { (name, glob) =>
      val nio = fsys.getPathMatcher(s"glob:$glob")
        .matches(java.nio.file.Paths.get(name))
      val ours = name.matches(globToRegex(glob))
      assert(ours == nio, s"glob '$glob' vs name '$name': ours=$ours nio=$nio")
    }
  }

  test("naSanitize nulls NA variants, keeps the rest") {
    import spark.implicits._
    val got = Seq("NA", "na", "  Na ", "nah", "x", null)
      .toDF("v").select(naSanitize(col("v")).as("v")).collect().map(_.getString(0))
    assert(got.toSeq == Seq(null, null, null, "nah", "x", null))
  }

  test("unicodeUnescape: F9 tool-output decoding") {
    import TextFunctions._
    assert(unicodeUnescape("caf\\u00e9 \\u2603") == "caf\u00e9 \u2603")
    assert(unicodeUnescape("no escapes") == "no escapes")
    assert(unicodeUnescape("bad \\uZZZZ stays") == "bad \\uZZZZ stays")
    assert(unicodeUnescape(null) == null)
  }

  test("tokenCount handles blanks") {
    import spark.implicits._
    val got = Seq("a b  c", "  ", "", "one", null)
      .toDF("v").select(tokenCount(col("v")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(got.toSeq == Seq(3L, 0L, 0L, 1L, -1L))
  }
}

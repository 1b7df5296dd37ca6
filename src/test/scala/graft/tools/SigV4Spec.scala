package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** SigV4 against the published AWS documentation example — exact
  * canonical-request, string-to-sign, and signature values, not a
  * round-trip through our own code. Vector: GET iam ListUsers,
  * 20150830T123600Z, AKIDEXAMPLE (docs.aws.amazon.com, "Signature
  * Version 4 signing process — complete example"). */
class SigV4Spec extends AnyFunSuite {

  private val accessKey = "AKIDEXAMPLE"
  private val secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  // 2015-08-30T12:36:00Z
  private val epochMillis = 1440938160000L

  test("doc example: canonical request hash and final signature match AWS's published values") {
    val s = SigV4.sign("GET",
      "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
      Map("Content-Type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      Array.emptyByteArray, accessKey, secretKey, "us-east-1", "iam",
      epochMillis)

    assert(s.canonicalRequest ===
      Seq("GET", "/", "Action=ListUsers&Version=2010-05-08",
        "content-type:application/x-www-form-urlencoded; charset=utf-8",
        "host:iam.amazonaws.com",
        "x-amz-date:20150830T123600Z",
        "",
        "content-type;host;x-amz-date",
        "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
        .mkString("\n"))
    assert(s.stringToSign.endsWith(
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"))
    assert(s.signature ===
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(s.headers("Authorization") ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/" +
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(s.headers("x-amz-date") === "20150830T123600Z")
  }

  test("query params are sorted and uri-encoded; path is used verbatim") {
    val s = SigV4.sign("GET",
      "https://svc.example.com/a%3Ab/c?z=2&a=1&sp=a%20b",
      Map.empty, Array.emptyByteArray, "AK", "SK", "r", "svc", 0L)
    val lines = s.canonicalRequest.split("\n")
    assert(lines(1) === "/a%3Ab/c") // single-encoded path, untouched
    assert(lines(2) === "a=1&sp=a%20b&z=2") // sorted, normalized
  }

  test("canonical query sorts by (name, value), not by joined strings, and keeps '+' literal") {
    // 'a' vs 'a-b': '=' (0x3D) sorts after '-' (0x2D), so joined-string
    // sorting would misorder "a=..." vs "a-b=..." — AWS sorts names first
    val s1 = SigV4.sign("GET", "https://svc.example.com/?a-b=1&a=2",
      Map.empty, Array.emptyByteArray, "AK", "SK", "r", "svc", 0L)
    assert(s1.canonicalRequest.split("\n")(2) === "a=2&a-b=1")
    // '+' in a query string is a LITERAL plus (form-encoding is not URI
    // encoding): it must re-encode as %2B, never collapse to a space
    val s2 = SigV4.sign("GET", "https://svc.example.com/?tok=a+b",
      Map.empty, Array.emptyByteArray, "AK", "SK", "r", "svc", 0L)
    assert(s2.canonicalRequest.split("\n")(2) === "tok=a%2Bb")
    // same name twice: values sort within the name group
    val s3 = SigV4.sign("GET", "https://svc.example.com/?k=2&k=1",
      Map.empty, Array.emptyByteArray, "AK", "SK", "r", "svc", 0L)
    assert(s3.canonicalRequest.split("\n")(2) === "k=1&k=2")
  }

  test("percentDecode: %XX decoded, '+' and malformed escapes pass through") {
    assert(SigV4.percentDecode("a%20b") === "a b")
    assert(SigV4.percentDecode("a+b") === "a+b")
    assert(SigV4.percentDecode("100%") === "100%")
    assert(SigV4.percentDecode("%zz") === "%zz")
    assert(SigV4.percentDecode("%C3%A4") === "ä")
  }

  test("uriEncode: unreserved passthrough, everything else uppercase %XX of UTF-8") {
    assert(SigV4.encodePathSegment("anthropic.claude-3-haiku:0")
      === "anthropic.claude-3-haiku%3A0")
    assert(SigV4.encodePathSegment("a b/~_ä") === "a%20b%2F~_%C3%A4")
  }

  test("SigV4Transport signs what it forwards; body changes the signature") {
    var seen: Map[String, String] = Map.empty
    val inner = new CannedTransport({ (_, _, headers, _) =>
      seen = headers; HttpResponse.ok("{}")
    })
    val t = new SigV4Transport(inner, "AK", "SK", "us-east-1", "bedrock",
      clock = () => 1440938160000L)
    t.request("POST", "https://bedrock-runtime.us-east-1.amazonaws.com/model/m/converse",
      Map("Content-Type" -> "application/json"), "{\"a\":1}".getBytes("UTF-8"))
    val auth1 = seen("Authorization")
    assert(auth1.startsWith("AWS4-HMAC-SHA256 Credential=AK/20150830/us-east-1/bedrock/aws4_request"))
    assert(auth1.contains("SignedHeaders=content-type;host;x-amz-date"))
    assert(seen("x-amz-date") === "20150830T123600Z")
    assert(seen("Content-Type") === "application/json") // original kept

    t.request("POST", "https://bedrock-runtime.us-east-1.amazonaws.com/model/m/converse",
      Map("Content-Type" -> "application/json"), "{\"a\":2}".getBytes("UTF-8"))
    assert(seen("Authorization") !== auth1) // payload hash is signed
  }
}

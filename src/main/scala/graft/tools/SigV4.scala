package graft.tools

/** AWS Signature Version 4 request signing — the documented public
  * algorithm (docs.aws.amazon.com "Signature Version 4 signing
  * process"), pure JDK crypto. This is the auth layer under the
  * reference's bedrock adapters (sdk1/adapters/llm1/bedrock.py +
  * embedding1/bedrock.py, where boto3 signs): here it is a transport
  * decorator, the same seam the SSRF guard and the Google
  * service-account OAuth use, so provider wires stay auth-free.
  *
  * SigV4Spec pins the implementation against the published AWS doc
  * example (GET iam ListUsers, 20150830T123600Z, AKIDEXAMPLE) — exact
  * canonical-request hash and signature, not a round-trip.
  */
object SigV4 {

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  /** SigV4's uri-encode: RFC 3986 unreserved characters pass through,
    * everything else becomes uppercase %XX of its UTF-8 bytes. */
  private[tools] def uriEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes("UTF-8").foreach { b =>
      val i = b & 0xff
      val c = i.toChar
      if (i < 0x80 && (Character.isLetterOrDigit(c) || "-._~".indexOf(c) >= 0))
        sb.append(c)
      else sb.append(f"%%$i%02X")
    }
    sb.toString
  }

  /** Encode one URL path segment (RFC 3986 unreserved passthrough) —
    * for services whose resource ids carry reserved chars, e.g.
    * Bedrock model ids with ':' version suffixes; the encoded form is
    * what the canonical path must contain. */
  def encodePathSegment(s: String): String = uriEncode(s)

  /** Raw percent-decoder: %XX → byte, everything else verbatim — in
    * particular '+' stays literal ('+' means space only in
    * application/x-www-form-urlencoded, not in a query string AWS
    * signs). Malformed escapes pass through untouched. */
  private[tools] def percentDecode(s: String): String = {
    val bytes = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        val cb = String.valueOf(c).getBytes("UTF-8")
        bytes.write(cb, 0, cb.length); i += 1
      }
    }
    new String(bytes.toByteArray, "UTF-8")
  }

  final case class Signed(headers: Map[String, String],
      canonicalRequest: String, stringToSign: String, signature: String)

  /** Sign one request. Query components are normalized (decode →
    * uri-encode → sort); the raw path is used verbatim (single-encoded,
    * the non-S3 rule). Signed headers = caller headers + host +
    * x-amz-date. Returns the two headers to add. */
  def sign(method: String, url: String, headers: Map[String, String],
      body: Array[Byte], accessKey: String, secretKey: String,
      region: String, service: String, epochMillis: Long): Signed = {
    val u = java.net.URI.create(url)
    val host = u.getHost +
      (if (u.getPort > 0) ":" + u.getPort else "")
    val path = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
    // AWS sorts canonical query params by encoded NAME first, then
    // encoded VALUE — sorting the joined "name=value" strings diverges
    // because '=' (0x3D) sorts after '-'/'.'/digits, misordering
    // prefix-related names like `a` vs `a-b`. Decoding must also keep
    // '+' literal (URLDecoder would turn it into a space), so use a
    // raw percent-decoder before re-encoding.
    val canonicalQuery = Option(u.getRawQuery).filter(_.nonEmpty)
      .map(_.split("&").toSeq.map { p =>
        val Array(n, v) = (p.split("=", 2) ++ Array("")).take(2)
        def norm(s: String) = uriEncode(percentDecode(s))
        (norm(n), norm(v))
      }.sorted.map { case (n, v) => s"$n=$v" }.mkString("&"))
      .getOrElse("")

    val t = java.time.Instant.ofEpochMilli(epochMillis)
      .atZone(java.time.ZoneOffset.UTC)
    val amzDate = t.format(java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'"))
    val dateStamp = amzDate.take(8)

    val all = headers.map { case (k, v) => k.toLowerCase -> v.trim } ++
      Map("host" -> host, "x-amz-date" -> amzDate)
    val names = all.keys.toSeq.sorted
    val canonicalRequest = Seq(
      method, path, canonicalQuery,
      names.map(n => s"$n:${all(n)}\n").mkString,
      names.mkString(";"), hex(sha256(body))).mkString("\n")

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      hex(sha256(canonicalRequest.getBytes("UTF-8")))).mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes("UTF-8"), dateStamp), region), service),
      "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    Signed(Map(
      "x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=${names.mkString(";")}, Signature=$signature")),
      canonicalRequest, stringToSign, signature)
  }
}

/** Transport decorator that SigV4-signs every request passing through —
  * wrap any [[HttpTransport]] (JDK or canned) to talk to an AWS
  * service; wires stay protocol-only. */
final class SigV4Transport(inner: HttpTransport, accessKey: String,
    secretKey: String, region: String, service: String,
    clock: () => Long = () => System.currentTimeMillis()) extends HttpTransport {

  def request(method: String, url: String, headers: Map[String, String],
      body: Array[Byte]): HttpResponse = {
    val signed = SigV4.sign(method, url, headers, body, accessKey, secretKey,
      region, service, clock())
    inner.request(method, url, headers ++ signed.headers, body)
  }
}

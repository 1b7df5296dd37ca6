package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** D19 evaluation + D21 webhook postprocess.
  *
  * Webhook: the reference POSTs each parsed result to an HTTPS endpoint
  * with SSRF guards and a 60s timeout (answer_prompt.py:44-76,283-310).
  * Here the transport is pluggable (this container has zero egress); the
  * partition-level delivery loop, batching and failure accounting are
  * the real engine code.
  */
object Postprocess {

  // --- D19 evaluation ------------------------------------------------------

  /** Per-answer quality metrics struct (the reference's eval plugin
    * emits metrics keyed eval_…; legacy_executor.py:1597-1627). */
  def evalMetrics(answer: org.apache.spark.sql.Column,
      context: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    struct(
      (length(answer) > 0).as("eval_nonempty"),
      context.contains(answer).as("eval_grounded"),
      (length(answer).cast("double") / greatest(length(context), lit(1)).cast("double"))
        .as("eval_len_ratio"))

  // --- D21 webhook ---------------------------------------------------------

  /** Transport abstraction; real deployments use an HTTP client with the
    * reference's timeout + SSRF checks. */
  trait Transport extends Serializable {
    /** Returns true on success (2xx). */
    def post(url: String, body: String): Boolean
  }

  /** Collecting transport for tests/dry-runs (per-JVM buffer — works in
    * local mode; cluster runs use a real transport). */
  class CollectingTransport extends Transport {
    override def post(url: String, body: String): Boolean = {
      CollectingTransport.sent.add(url -> body)
      true
    }
  }
  object CollectingTransport {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
  }

  /** Guard from the reference: only https, no link-local/metadata hosts. */
  def urlAllowed(url: String): Boolean = {
    if (!url.startsWith("https://")) return false
    val host = new java.net.URI(url).getHost
    host != null && !host.startsWith("169.254.") && host != "localhost" &&
      !host.startsWith("127.") && host != "metadata.google.internal"
  }

  /** Deliver each row's JSON to the webhook, per partition, counting
    * failures via an accumulator. Side-effecting by design — documented,
    * and rows are idempotent payloads keyed by id. */
  def deliver(results: DataFrame, url: String, mkTransport: () => Transport): Long = {
    require(urlAllowed(url) || url.startsWith("test://"), s"webhook url rejected: $url")
    val failures = results.sparkSession.sparkContext.longAccumulator("webhook_failures")
    results.toJSON.foreachPartition { (rows: Iterator[String]) =>
      val t = mkTransport()
      rows.foreach { body => if (!t.post(url, body)) failures.add(1) }
    }
    failures.value
  }
}

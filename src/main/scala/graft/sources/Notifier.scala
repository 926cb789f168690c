package graft.sources

/** End-of-run observability hooks (reference parity:
  * `mitx/mitx_etl.py:158-192` — Slack webhook on sync success/failure with
  * request errors swallowed, healthcheck GET where failure exits 1).
  *
  * Driver-side, pluggable, no-op-able: pipelines call `notify`/`healthcheck`
  * at DAG end; tests inject a recording implementation; production wires
  * `java.net.http.HttpClient`. Notification failures never fail the job
  * (reference swallows them); healthcheck failures DO (reference exits 1).
  */
trait Notifier {
  /** Fire-and-forget status message; implementations must not throw. */
  def notify(message: String): Unit
  /** Liveness ping; a false return fails the pipeline. */
  def healthcheck(): Boolean
}

object Notifier {
  /** Default no-op notifier (local/test runs). */
  object Silent extends Notifier {
    def notify(message: String): Unit = ()
    def healthcheck(): Boolean = true
  }

  /** Webhook-backed notifier. POST failures are swallowed (notify) /
    * surfaced as false (healthcheck), mirroring the reference. Connect and
    * per-request timeouts are mandatory: healthcheck failure is supposed to
    * FAIL the pipeline — an unresponsive endpoint must surface as a timely
    * false, never hang the driver. */
  final class Webhook(slackUrl: String, healthUrl: String,
                      timeout: java.time.Duration = java.time.Duration.ofSeconds(10)) extends Notifier {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout).build()
    private def jsonStr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def notify(message: String): Unit =
      try {
        val body = s"""{"text":${jsonStr(message)}}"""
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(slackUrl))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .timeout(timeout)
          .header("Content-Type", "application/json").build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
        ()
      } catch { case _: Throwable => () }
    def healthcheck(): Boolean =
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(healthUrl))
          .GET().timeout(timeout).build()
        client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode() / 100 == 2
      } catch { case _: Throwable => false }
  }
}

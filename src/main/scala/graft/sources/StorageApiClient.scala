package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Keboola Storage API metadata client (S5): GET table detail, extract the
  * column list — the Spark-side equivalent of the reference's retrying
  * urllib client (`components/wr-iceberg/src/storage_api_client.py:8-30`,
  * used by the `list_table_columns` sync action, `wr/src/component.py:154-166`).
  *
  * Same retry budget: 3 attempts with linear 1s/2s backoff
  * (`storage_api_client.py:9,18-28`). Pure metadata plumbing — no Spark
  * involvement.
  */
class StorageApiClient(
    baseUrl: String, token: String,
    maxRetries: Int = 3, backoffMillis: Long = 1000L) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** GET /v2/storage/tables/{id} and return the `columns` array. */
  def getTableColumns(tableId: String): Seq[String] = {
    val body = getWithRetry(s"$baseUrl/v2/storage/tables/$tableId")
    // minimal extraction of "columns": [...] — the only field used
    val m = """"columns"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
      .getOrElse(throw new IllegalStateException(s"no columns field in $body"))
    """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
  }

  private def getWithRetry(url: String): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      attempt += 1
      try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .header("X-StorageApi-Token", token)
          .timeout(Duration.ofSeconds(30)).GET().build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return resp.body()
        last = new IllegalStateException(s"HTTP ${resp.statusCode()} from $url")
      } catch { case e: Exception => last = e }
      if (attempt < maxRetries) Thread.sleep(backoffMillis * attempt)
    }
    throw new IllegalStateException(s"failed after $maxRetries attempts: $url", last)
  }
}

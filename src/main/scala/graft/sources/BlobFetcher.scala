package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** OP-02: HTTP blob fetch — download URL -> bytes, FAIL on non-2xx
  * (reference bs4_scraper.py:39-42 raise_for_status) and on an empty
  * body (releases_scraper.py:128-130 "Downloaded file is empty").
  *
  * The reference fetches driver-side in a per-release loop; here the
  * fetch is a DataFrame transform — one executor-side call per (filename,
  * url) row — so a scrape of millions of documents parallelizes across
  * the cluster instead of serializing on the driver. A failed fetch
  * fails its task (and with it the scrape), exactly as raise_for_status
  * aborts the reference's Lambda and redrives the message.
  *
  * The transport is injected (`Fetch`): production uses [[httpFetch]]
  * (java.net.http); tests inject a deterministic fake — the failure
  * semantics and all downstream plumbing are identical either way.
  */
object BlobFetcher {

  /** url => (http status, body bytes). Must be serializable — it ships
    * to executors.
    */
  type Fetch = String => (Int, Array[Byte])

  /** One HTTP client per executor JVM (lazily built on first use, after
    * deserialization) — per-row clients would cold-handshake every fetch
    * and allocate a pool per document. Redirects FOLLOW (the JDK default
    * is NEVER, which would fail every 301/302 — http->https upgrades and
    * CDN moves are routine on scraped government links — where the
    * reference's requests.get follows them); timeouts bound a hung
    * server instead of blocking the executor task forever.
    */
  @transient private lazy val sharedClient = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .connectTimeout(java.time.Duration.ofSeconds(20))
    .build()

  /** Production transport: blocking GET via java.net.http. */
  def httpFetch: Fetch = { url =>
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMinutes(2))
      .GET().build()
    val res = sharedClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    (res.statusCode(), res.body())
  }

  /** The fail-fast contract shared by every fetch path: non-2xx or an
    * empty body throws (raise_for_status + the reference's empty-file
    * guard). Serializable — runs on executors and on the driver alike.
    */
  def checkedFetch(fetch: Fetch, url: String): Array[Byte] = {
    val (status, body) = fetch(url)
    if (status < 200 || status > 299)
      throw new java.io.IOException(s"fetch failed: HTTP $status for $url")
    if (body.isEmpty)
      throw new java.io.IOException(s"downloaded file is empty: $url")
    body
  }

  /** Driver-side single-document GET — for the LISTING page, which is
    * one document (reference bs4_scraper.py:18-22 fetches it inline
    * too; distributing a single GET buys nothing). Returns the decoded
    * body.
    */
  def fetchPage(fetch: Fetch, url: String): String =
    new String(checkedFetch(fetch, url), java.nio.charset.StandardCharsets.UTF_8)

  /** Fetch each candidate's url: (filename, url, ...) -> (filename,
    * content). Non-2xx or empty body throws in the task.
    */
  def fetchBlobs(candidates: DataFrame, fetch: Fetch): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates.select("filename", "url").as[(String, String)]
      .mapPartitions(_.map { case (filename, url) =>
        (filename, checkedFetch(fetch, url))
      }).toDF("filename", "content")
  }

  /** OP-03 put: persist (filename, content) rows as blobs under `dir`
    * (the reference's storage.save_file). Executor-side writes; local/
    * NFS paths here, object stores via their FS connector.
    */
  def saveBlobs(blobs: DataFrame, dir: String): Unit = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select("filename", "content").as[(String, Array[Byte])]
      .foreachPartition { it: Iterator[(String, Array[Byte])] =>
        // executor-side mkdirs (idempotent): on a real cluster the
        // driver's filesystem is not the executors' — a driver-only
        // mkdirs would leave every task failing NoSuchFileException
        new File(dir).mkdirs()
        val root = Paths.get(dir).normalize()
        it.foreach { case (filename, content) =>
          // filenames originate in scraped listing pages — REMOTE
          // content: one carrying a separator or traversal ("../x")
          // must not escape the blob directory
          val p = Paths.get(dir, filename).normalize()
          if (filename.contains("/") || filename.contains("\\") ||
              !p.startsWith(root) || p == root)
            throw new java.io.IOException(s"unsafe blob filename: $filename")
          Files.write(p, content)
        }
      }
  }

  /** OP-27's probe side: the stored-file listing as a DataFrame. */
  def listBlobs(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Option(new File(dir).list()).toSeq.flatten.toSeq.toDF("filename")
  }
}

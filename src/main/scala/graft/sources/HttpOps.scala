package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** HTTP fetch as a dataflow stage (SURVEY §2.1 S5/S6): the reference
  * downloads PDFs (`requests.get`, `bin/main.py:172-196`) and looks up
  * titles (`curl`, `bin/publish.rb:77-81`) one URL at a time; here the
  * fetch is a mapPartitions stage over a URL column — each partition
  * reuses one client, failures become (status, null) rows instead of
  * aborting the job, and idempotence comes from the F7 anti-join upstream
  * ([[graft.plans.Incremental.notYetDone]]), not from ad-hoc existence
  * checks.
  *
  * The transport is a pluggable adapter: this container has zero egress,
  * so the default is a deterministic STUB keyed on the URL (stable
  * status/body per URL — useful for tests and for exercising the status
  * dispatch F3 downstream). Swap [[HttpFetcher]] for a real client on a
  * cluster; the stage shape does not change.
  */
object HttpOps {

  final case class FetchResult(url: String, status: Int, body: Array[Byte])

  trait HttpFetcher extends Serializable {
    def fetch(url: String): (Int, Array[Byte])
  }

  /** Deterministic stub: status and body derived from the URL hash —
    * ~80% 200s with reproducible 401/404/500s, mirroring the status mix
    * the reference dispatches on (`bin/main.py:495-538`). */
  object StubFetcher extends HttpFetcher {
    def fetch(url: String): (Int, Array[Byte]) = {
      val h = math.abs(url.hashCode.toLong)
      val status = (h % 10L) match {
        case 8L => 404
        case 9L => if (h % 20L == 9L) 401 else 500
        case _ => 200
      }
      val body = if (status == 200) s"payload-of:$url".getBytes("UTF-8") else null
      (status, body)
    }
  }

  /** REAL transport over the JDK's own `java.net.http.HttpClient` (no
    * added dependency): GET the URL, return (status, body) with the body
    * kept only for 200s — the reference's download semantics
    * (`requests.get` + status dispatch, `bin/main.py:172-196`). Network
    * failures surface as synthetic status 599 with no body, so a flaky
    * host becomes dead-letter rows downstream (F3) instead of a job
    * abort. The client is per-JVM-instance (`@transient lazy`): Spark
    * serializes the fetcher to executors, and each deserialized copy
    * builds its own connection pool — the partition-level client reuse
    * the mapPartitions stage is designed around.
    *
    * The zero-egress sandbox means specs exercise this against an
    * in-process loopback fixture server (`HarvestSpec`); on a cluster
    * the same instance talks to the real host. */
  final class JdkHttpFetcher(timeoutMs: Long = 30000L) extends HttpFetcher {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()
    def fetch(url: String): (Int, Array[Byte]) =
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        val status = resp.statusCode()
        (status, if (status == 200) resp.body() else null)
      } catch {
        // restore the interrupt flag: Spark cancels tasks by interrupting
        // the thread, and swallowing it would make the partition keep
        // fetching every remaining URL after a job kill (reviewed round 4)
        case _: InterruptedException =>
          Thread.currentThread().interrupt(); (599, null)
        // includes IllegalArgumentException from URI.create on malformed
        // hand-keyed hrefs — a bad URL is a dead-letter row, not a job
        // abort (the documented contract)
        case scala.util.control.NonFatal(_) => (599, null)
      }
  }

  /** Body write-if-absent (`bin/main.py:184-196`): persist each 200
    * body to `<dir>/<name>` unless the file already exists — the
    * reference's "skip downloads whose output is on disk" idempotence
    * (F7), executor-parallel. Each body lands via a unique temp file +
    * ATOMIC_MOVE: a task killed mid-write leaves only a temp (swept by
    * the final-state janitor pattern), never a truncated file that every
    * re-run would then "skip" as done (reviewed round 4) — the visible
    * file is complete or absent. Existing files short-circuit to
    * skipped before any write; two LIVE racers on one URL write the
    * same bytes, so the atomic rename's last-wins replace (POSIX) or
    * FileAlreadyExistsException (elsewhere) are both benign — the
    * visible file is always one writer's complete body. Returns
    * (written, skipped).
    *
    * `results` is consumed by ONE action here, but it is a lazily
    * recomputed plan like any DataFrame: if it wraps a live [[fetchAll]]
    * (rather than the pipeline's parquet checkpoint of it), this action
    * re-downloads — persist/checkpoint the fetch output first when the
    * bodies were already materialized for checksums. */
  def writeBodiesIfAbsent(results: DataFrame, dir: String,
      nameCol: String = "url"): (Long, Long) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val counts = results
      .filter(col("status") === 200 && col("body").isNotNull)
      .select(col(nameCol).cast("string"), col("body"))
      .mapPartitions { rows =>
        var written = 0L; var skipped = 0L
        rows.foreach { r =>
          val name = java.net.URLEncoder.encode(r.getString(0), "UTF-8")
          val p = Paths.get(dir, name)
          if (Files.exists(p)) skipped += 1
          else {
            val tmp = Paths.get(dir,
              s".$name._body_${java.util.UUID.randomUUID()}")
            try {
              Files.createDirectories(tmp.getParent)
              Files.write(tmp, r.getAs[Array[Byte]](1))
              Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
              written += 1
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                Files.deleteIfExists(tmp); skipped += 1
            }
          }
        }
        Iterator((written, skipped))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .collect()
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }

  /** Fetch each distinct URL in `urlCol`; returns (url, status, body).
    * Partition-parallel; one adapter per partition. Join the result back
    * to the work list on the URL — the checkpointed Pdf-record update
    * (`bin/main.py:173-181`) as a pure transformation. */
  def fetchAll(work: DataFrame, urlCol: String,
      fetcher: HttpFetcher = StubFetcher): DataFrame = {
    implicit val enc = Encoders.product[FetchResult]
    work.select(col(urlCol).as("url")).distinct()
      .mapPartitions { rows =>
        rows.map { r =>
          val url = r.getString(0)
          val (status, body) = fetcher.fetch(url)
          FetchResult(url, status, body)
        }
      }
      .toDF("url", "status", "body")
  }
}

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

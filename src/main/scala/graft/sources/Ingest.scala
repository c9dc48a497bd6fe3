package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Ingestion connector seam — the engine-side abstraction of the
  * reference's collection step (collect-data.py:66-109: Selenium/BS4
  * page scrape and HTTP API fetch).
  *
  * Spark shape: collection is genuinely imperative per-item I/O, so this
  * is one of the few places the engine uses `mapPartitions` — one
  * connector instance (browser session / HTTP client / API token) per
  * partition, work driven in bounded batches, and per-item failures
  * captured as `status='error'` rows instead of failing the job (the
  * contract the reference's error writeback expects —
  * collect-data.py:178-180). At scale, parallelism = partitions of the
  * work-item table; repartition the pending set to set fetch fan-out.
  */
object Ingest {
  /** A unit of collection work: one control-table row (id, source, url). */
  case class WorkItem(id: Long, source: String, url: String)

  /** Collection result: raw payload body on success, error message and
    * status='error' on failure — ready for the status writeback merge. */
  case class Payload(id: Long, source: String, url: String, status: String, body: String)

  /** A per-partition fetcher. Implementations wrap the real transport
    * (HTTP client, headless browser, API SDK); they are instantiated on
    * the driver and serialized to executors, so keep them stateless and
    * open connections lazily inside fetchBatch. */
  trait Connector extends Serializable {
    /** Fetch one bounded batch; Left(error) marks the item failed. */
    def fetchBatch(batch: Seq[WorkItem]): Seq[(WorkItem, Either[String, String])]
  }

  /** Deterministic offline connector (no egress in this environment):
    * "fetches" a synthetic page body derived from the url; urls
    * containing "invalid" fail — exercising the error path end-to-end. */
  class StubConnector extends Connector {
    override def fetchBatch(batch: Seq[WorkItem]): Seq[(WorkItem, Either[String, String])] =
      batch.map { w =>
        if (w.url.contains("invalid")) w -> Left(s"fetch failed: ${w.url}")
        else w -> Right(s"<html>payload:${w.source}:${w.url.hashCode}</html>")
      }
  }

  /** File-backed HTTP connector — the requests-loop twin of the
    * reference's API fetch (collect-data.py:100-140) against a LOCAL
    * fixture root (this environment has no egress; in production the
    * file read becomes the HTTP client call — the seam, batching, and
    * error taxonomy are identical). The url's path resolves to a file
    * under `fixtureRoot`; the response body is the file content.
    *
    * Error taxonomy mirrors HTTP status classes so downstream retry
    * scheduling (a17's ErrorEquals semantics) can route them:
    *  - missing fixture → `HTTP 404` — permanent, the dead-letter class;
    *  - a `<file>.flaky` marker → `HTTP 503` ONCE; the marker is
    *    consumed by the failing fetch, so the next attempt succeeds —
    *    a deterministic transient, which is exactly what the retry
    *    layer exists for. */
  class FixtureHttpConnector(fixtureRoot: String) extends Connector {
    override def fetchBatch(batch: Seq[WorkItem]): Seq[(WorkItem, Either[String, String])] =
      batch.map { w =>
        val rel = new java.net.URI(w.url).getPath.stripPrefix("/")
        val f = new java.io.File(fixtureRoot, rel)
        val flaky = new java.io.File(fixtureRoot, rel + ".flaky")
        if (flaky.exists() && flaky.delete())
          w -> Left(s"HTTP 503 service unavailable: ${w.url}")
        else if (!f.isFile)
          w -> Left(s"HTTP 404 not found: ${w.url}")
        else {
          val src = scala.io.Source.fromFile(f, "UTF-8")
          val body = try src.mkString finally src.close()
          w -> Right(body)
        }
      }
  }

  /** Drive a Connector over a work-item Dataset: per-partition batched
    * fetch, failures as error rows. Output feeds PartitionedSink (raw
    * payload staging) and Etl.statusWriteback (control-table update). */
  def collect(spark: SparkSession, items: Dataset[WorkItem], connector: Connector,
              batchSize: Int = 32): Dataset[Payload] = {
    import spark.implicits._
    items.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        connector.fetchBatch(batch).map {
          case (w, Right(body)) => Payload(w.id, w.source, w.url, "completed", body)
          case (w, Left(err))   => Payload(w.id, w.source, w.url, "error", err)
        }
      }
    }
  }
}

package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * External document-store sink (SURVEY §2.1 S5–S7, §2.10 I1–I3): the
 * engine-side replacement for the reference's `V3Handler` write path.
 * Isolated from the relational engine so correctness never depends on it
 * (SURVEY §7.1 module 6).
 *
 * Mapping of the reference's hand-rolled infrastructure onto Spark:
 *  - bulk chunking of ≤500 docs/call (`ingestion_handler.py:122-136`) →
 *    `iterator.grouped(chunk)` inside `foreachPartition`;
 *  - bounded concurrency semaphore (`ingestion_handler.py:28-29,83`) →
 *    partition count: `coalesce(concurrency)` before the write, so at most
 *    `concurrency` transport calls are in flight cluster-wide;
 *  - retry with exponential backoff + jitter, pass-through exception types
 *    (`ingestion_handler.py:70-78,104-120`) → per-call retry loop below;
 *  - token refresh with drain barrier (`ingestion_handler.py:51-67,81-101`)
 *    → per-executor `TokenProvider` singleton: calls synchronize on
 *    refresh, so in-flight requests drain before a new token is fetched.
 */
object DocumentSink {

  /** Transport boundary — HTTP/Tapis in production; recording/flaky
    * implementations in tests. Must be serializable (ships to executors). */
  trait DocTransport extends Serializable {
    /** Bulk create one chunk of document-envelope JSON strings (S6). */
    def createBulk(docs: Seq[String]): Unit
    /** Point replace by document id (S7). */
    def replace(id: String, doc: String): Unit
  }

  /** Cached bearer token with refresh-before-expiry (I3). `fetch` returns
    * (token, expiresAtEpochMs); refresh when < `marginMs` left (reference:
    * 5 minutes, `ingestion_handler.py:53`). */
  final class TokenProvider(fetch: () => (String, Long), marginMs: Long = 5 * 60 * 1000L)
      extends Serializable {
    @volatile private var cached: (String, Long) = null
    def token(): String = {
      val c = cached
      if (c != null && c._2 - System.currentTimeMillis() > marginMs) c._1
      else synchronized { // drain barrier: one refresher, others wait
        val c2 = cached
        if (c2 != null && c2._2 - System.currentTimeMillis() > marginMs) c2._1
        else { cached = fetch(); cached._1 }
      }
    }
  }

  /** Retry with exponential backoff + jitter (I1): first wait 0.25–0.5 s,
    * then ×2–3 per attempt; exceptions in `passThrough` abort immediately
    * (the reference's `ignore_exceptions` exact-type match). */
  def withRetry[T](retries: Int, passThrough: Set[Class[_]] = Set.empty,
      sleep: Long => Unit = Thread.sleep)(op: () => T): T = {
    val rnd = new scala.util.Random()
    var delayMs: Long = 250L + rnd.nextInt(251) // 0.25–0.5 s
    var attempt = 0
    while (true) {
      try return op()
      catch {
        case e: Throwable if !passThrough.contains(e.getClass) && attempt < retries =>
          sleep(delayMs)
          delayMs = (delayMs * (2.0 + rnd.nextDouble())).toLong // ×2–3
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Wrap rows in the reference's document envelope `{name, value}`
    * (`tapis_direct_driver.py:162-165`) as a JSON column. */
  def envelope(df: DataFrame, docName: String): DataFrame = {
    val valueCols = df.columns.filterNot(_ == "uuid")
    df.select(
      col("uuid"),
      to_json(struct(
        lit(docName).as("name"),
        struct(valueCols.map(col): _*).as("value"))).as("doc"))
  }

  /**
   * Write creates in bulk chunks (S5/S6). One transport instance per
   * partition; `concurrency` bounds in-flight calls exactly like the
   * reference's semaphore.
   */
  def writeCreates(creates: DataFrame, docName: String, transport: DocTransport,
      chunkSize: Int = 500, retries: Int = 3, concurrency: Int = 4): Unit =
    envelope(creates, docName).coalesce(concurrency).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.map(_.getAs[String]("doc")).grouped(chunkSize).foreach { chunk =>
          withRetry(retries)(() => transport.createBulk(chunk))
        }
    }

  /** Write replaces by id (S7) — point writes, same retry/concurrency. */
  def writeReplaces(replaces: DataFrame, docName: String, transport: DocTransport,
      retries: Int = 3, concurrency: Int = 4): Unit =
    envelope(replaces, docName).coalesce(concurrency).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          withRetry(retries)(() => transport.replace(r.getAs[String]("uuid"),
            r.getAs[String]("doc")))
        }
    }
}

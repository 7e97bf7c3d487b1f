package graft.streaming

import scala.annotation.tailrec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Reliability surface: fatal-vs-transient error classification, retry with
  * capped exponential backoff, and restart policy (reference S4/E4:
  * internal/wal/reader.go:233-293, 533-592; internal/engine/engine.go:223-226,
  * 698-704).
  */
object Reliability {

  /** SQLSTATE classes the reference treats as fatal (no reconnect):
    * 28xxx invalid authorization, 42501 insufficient privilege, 42704
    * undefined object (missing replication slot) — reader.go:543-572.
    * Everything else (network drops, timeouts) is transient.
    */
  def isFatalSqlState(sqlState: String): Boolean =
    sqlState != null && (sqlState.startsWith("28") ||
      sqlState == "42501" || sqlState == "42704")

  /** The socket transport renders server ErrorResponses as IOExceptions
    * with a trailing parenthesized SQLSTATE ([[graft.sources.PgWireProtocol
    * .errorString]]) — extract it so those classify like SQLExceptions.
    */
  private val SqlStateSuffix = """.*\(([0-9A-Z]{5})\)\s*$""".r

  def isFatal(e: Throwable): Boolean = e match {
    case s: java.sql.SQLException => isFatalSqlState(s.getSQLState)
    case _: SecurityException => true
    case io: java.io.IOException
        if io.getMessage != null &&
          SqlStateSuffix.pattern.matcher(io.getMessage).matches() =>
      val SqlStateSuffix(st) = io.getMessage
      isFatalSqlState(st) ||
        (io.getCause != null && (io.getCause ne io) && isFatal(io.getCause))
    case _ if e.getCause != null && (e.getCause ne e) => isFatal(e.getCause)
    case _ => false
  }

  /** Exponential backoff 1s·2^(n−1) capped at 8s (engine.go:223-226,
    * 698-704); n is 1-based attempt count.
    */
  def backoffMillis(attempt: Int, baseMillis: Long = 1000L, capMillis: Long = 8000L): Long =
    math.min(capMillis, baseMillis << math.min(attempt - 1, 30))

  /** Reconnect backoff 1s→30s with 50% jitter (reader.go:24, 574-592).
    * Jitter is seeded deterministically per attempt for testability.
    */
  def reconnectBackoffMillis(attempt: Int, seed: Long = 42L): Long = {
    val base = math.min(30000L, 1000L << math.min(attempt - 1, 30))
    val jitter = new java.util.Random(seed + attempt).nextDouble() * 0.5 * base
    base + jitter.toLong
  }

  /** Retry a side-effecting operation with the reference's publish policy:
    * up to maxRetries attempts after the first (MAX_PUBLISH_RETRIES=3,
    * config.go:84), capped exponential backoff, fatal errors never retried.
    */
  @tailrec
  def withRetry[A](maxRetries: Int = 3, attempt: Int = 1,
      sleep: Long => Unit = Thread.sleep,
      onRetry: () => Unit = () => ())(op: () => A): A = {
    val r = try Right(op()) catch { case e: Throwable => Left(e) }
    r match {
      case Right(a) => a
      case Left(e) if attempt > maxRetries || isFatal(e) => throw e
      case Left(_) =>
        onRetry() // publish_retries_total in the reference (engine.go:566)
        sleep(backoffMillis(attempt))
        withRetry(maxRetries, attempt + 1, sleep, onRetry)(op)
    }
  }

  /** Pipeline metrics via StreamingQueryListener (reference M1,
    * internal/metrics/metrics.go): counters for batches/rows, gauge for the
    * last progress timestamp, terminal-state capture for the restart policy.
    * Register with `spark.streams.addListener(listener)`; the same numbers
    * surface in the Spark metrics system / UI in a real deployment.
    *
    * Pass a [[CdcMetrics.Registry]] to additionally publish under the
    * reference's Prometheus metric names (events_total,
    * batches_published_total, batch_latency_microseconds,
    * events_per_second, replication_errors_total) — scrapable via
    * [[HealthServer]]'s /metrics.
    */
  final class CdcMetricsListener(registry: Option[CdcMetrics.Registry] = None)
      extends StreamingQueryListener {
    val batches = new AtomicLong(0)
    val inputRows = new AtomicLong(0)
    val starts = new AtomicLong(0)
    val terminations = new AtomicLong(0)
    val lastError = new AtomicReference[Option[String]](None)

    override def onQueryStarted(event: QueryStartedEvent): Unit =
      starts.incrementAndGet()
    override def onQueryProgress(event: QueryProgressEvent): Unit = {
      batches.incrementAndGet()
      inputRows.addAndGet(event.progress.numInputRows)
      registry.foreach { r =>
        r.eventsTotal.add(event.progress.numInputRows)
        r.batchesPublished.inc()
        Option(event.progress.durationMs.get("triggerExecution"))
          .foreach(ms => r.batchLatency.observe(ms * 1000L)) // micros
        r.eventsPerSecond.set(event.progress.processedRowsPerSecond.toLong)
      }
    }
    override def onQueryIdle(event: QueryIdleEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
      terminations.incrementAndGet()
      lastError.set(event.exception)
      if (event.exception.isDefined)
        registry.foreach(_.replicationErrors.inc())
    }

    def snapshot: Map[String, Long] = Map(
      "batches" -> batches.get, "input_rows" -> inputRows.get,
      "starts" -> starts.get, "terminations" -> terminations.get)
  }

  /** Supervise a streaming query with the reference's restart policy: on
    * transient failure restart (with reconnect backoff) from the same
    * checkpoint; on fatal error or clean stop, return. Returns the number
    * of restarts performed.
    */
  def superviseRestarts(spark: SparkSession, maxRestarts: Int,
      sleep: Long => Unit = Thread.sleep)(
      start: () => org.apache.spark.sql.streaming.StreamingQuery): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      val q = start()
      try { q.awaitTermination(); done = true }
      catch {
        case e: Throwable if !isFatal(e) && restarts < maxRestarts =>
          restarts += 1
          sleep(reconnectBackoffMillis(restarts))
        case e: Throwable => throw e
      }
    }
    restarts
  }
}

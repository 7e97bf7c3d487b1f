package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CdcMetrics, HealthServer}

/** Health/readiness endpoints (reference M2, internal/health/server.go)
  * and the Prometheus-named metric registry (M1,
  * internal/metrics/prometheus.go:98-175).
  */
class HealthSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String) = {
    val resp = HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("registry exposes the reference's 15 metric names") {
    val r = new CdcMetrics.Registry
    val expected = Set(
      "cdc_engine_events_total", "cdc_engine_batches_published_total",
      "cdc_engine_batch_latency_microseconds",
      "cdc_engine_transform_latency_nanoseconds",
      "cdc_engine_partial_batch_failures_total",
      "cdc_engine_events_quarantined_total",
      "cdc_publisher_jetstream_published_total",
      "cdc_publisher_jetstream_ack_failures_total",
      "cdc_publisher_publish_retries_total",
      "cdc_parser_replication_lag_milliseconds",
      "cdc_parser_decode_errors_total", "cdc_parser_tx_buffer_size",
      "cdc_parser_tx_buffer_overflows_total",
      "cdc_wal_replication_errors_total", "cdc_engine_events_per_second")
    assert(r.names.toSet == expected)
    assert(r.names.size == 15)
  }

  test("scrape emits valid exposition blocks with HELP/TYPE and histogram shape") {
    val r = new CdcMetrics.Registry
    r.eventsTotal.add(42)
    r.replicationLag.set(7)
    r.batchLatency.observe(600)   // second bucket (500 < 600 <= 1000)
    r.batchLatency.observe(99999999) // +Inf only
    val page = r.scrape
    assert(page.contains("# HELP cdc_engine_events_total Total number of CDC events processed"))
    assert(page.contains("# TYPE cdc_engine_events_total counter"))
    assert(page.contains("cdc_engine_events_total 42"))
    assert(page.contains("cdc_parser_replication_lag_milliseconds 7"))
    // histogram: cumulative buckets, +Inf equals count
    assert(page.contains("""cdc_engine_batch_latency_microseconds_bucket{le="500"} 0"""))
    assert(page.contains("""cdc_engine_batch_latency_microseconds_bucket{le="1000"} 1"""))
    assert(page.contains("""cdc_engine_batch_latency_microseconds_bucket{le="+Inf"} 2"""))
    assert(page.contains("cdc_engine_batch_latency_microseconds_count 2"))
    assert(page.contains("cdc_engine_batch_latency_microseconds_sum 100000599"))
  }

  test("/health is 200; /ready aggregates check failures like the reference") {
    val r = new CdcMetrics.Registry
    val ok = HealthServer.Check("slot-store", () => ())
    val bad = HealthServer.Check("publisher", () => sys.error("connection refused"))
    val s = HealthServer.start(port = 0, checks = Seq(ok, bad), metrics = Some(r))
    try {
      assert(get(s.port, "/health") == (200, "ok"))
      val (code, body) = get(s.port, "/ready")
      assert(code == 503)
      assert(body.contains("publisher: connection refused"))
      assert(!body.contains("slot-store"))
    } finally s.stop()
  }

  test("/ready is 200 'ready' when all checks pass (or none registered)") {
    val s = HealthServer.start(port = 0)
    try assert(get(s.port, "/ready") == (200, "ready"))
    finally s.stop()
  }

  test("/ready bounds a hung check by the timeout") {
    val hang = HealthServer.Check("postgres", () => Thread.sleep(60000))
    val s = HealthServer.start(port = 0, checks = Seq(hang), checkTimeoutMillis = 200)
    try {
      val (code, body) = get(s.port, "/ready")
      assert(code == 503 && body.contains("postgres: check timed out"))
    } finally s.stop()
  }

  test("/debug pprof analogs: thread dump and heap summary") {
    val s = HealthServer.start(port = 0)
    try {
      val (tc, threads) = get(s.port, "/debug/threads")
      assert(tc == 200)
      // the serving thread itself must appear in its own dump
      assert(threads.contains("graft-health"))
      val (hc, heap) = get(s.port, "/debug/heap")
      assert(hc == 200)
      assert(heap.linesIterator.next().startsWith("heap: used="))
      assert(heap.contains("gc "), "GC collector stats present")
      assert(heap.contains("pool "), "memory pool stats present")
    } finally s.stop()
  }

  test("/metrics serves the scrape page end to end") {
    val r = new CdcMetrics.Registry
    r.decodeErrors.inc()
    val s = HealthServer.start(port = 0, metrics = Some(r))
    try {
      val (code, body) = get(s.port, "/metrics")
      assert(code == 200)
      assert(body.contains("cdc_parser_decode_errors_total 1"))
      assert(r.names.forall(body.contains))
    } finally s.stop()
  }
}

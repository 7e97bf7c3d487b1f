package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicLongArray}

/** Named-metric registry mirroring the reference's Prometheus surface
  * (internal/metrics/prometheus.go:98-175): the same 15 metrics under the
  * same `cdc_<subsystem>_<name>` exposition names, with a text-format
  * `scrape` servable by [[HealthServer]]'s /metrics endpoint. Self-
  * contained (no client library in the offline dependency set) — counters
  * and gauges are lock-free atomics, histograms keep cumulative bucket
  * counts exactly as the exposition format requires.
  */
object CdcMetrics {

  sealed trait Metric {
    def name: String
    def help: String
    def metricType: String
    def expose: Seq[String]
    final def scrapeBlock: String =
      (s"# HELP $name $help" +: s"# TYPE $name $metricType" +: expose).mkString("\n")
  }

  final class Counter(val name: String, val help: String) extends Metric {
    private val v = new AtomicLong(0)
    def inc(): Unit = v.incrementAndGet()
    def add(n: Long): Unit = v.addAndGet(n)
    def get: Long = v.get
    def metricType = "counter"
    def expose: Seq[String] = Seq(s"$name ${v.get}")
  }

  final class Gauge(val name: String, val help: String) extends Metric {
    private val v = new AtomicLong(0)
    def set(x: Long): Unit = v.set(x)
    def get: Long = v.get
    def metricType = "gauge"
    def expose: Seq[String] = Seq(s"$name ${v.get}")
  }

  final class Histogram(val name: String, val help: String,
      buckets: Seq[Double]) extends Metric {
    private val bounds = buckets.sorted
    private val counts = new AtomicLongArray(bounds.size + 1) // + Inf
    private val sum = new AtomicLong(0)
    private val n = new AtomicLong(0)
    def observe(value: Long): Unit = {
      val i = bounds.indexWhere(value <= _)
      counts.incrementAndGet(if (i < 0) bounds.size else i)
      sum.addAndGet(value)
      n.incrementAndGet()
    }
    def count: Long = n.get
    def metricType = "histogram"
    def expose: Seq[String] = {
      var cum = 0L
      val bucketLines = bounds.zipWithIndex.map { case (b, i) =>
        cum += counts.get(i)
        val le = if (b == b.floor) b.toLong.toString else b.toString
        s"""$name_bucket{le="$le"} $cum"""
      }
      bucketLines ++ Seq(
        s"""$name_bucket{le="+Inf"} ${n.get}""",
        s"${name}_sum ${sum.get}",
        s"${name}_count ${n.get}")
    }
    private def name_bucket = s"${name}_bucket"
  }

  /** The reference's full metric set — one field per registered metric,
    * same subsystem/name/help/buckets (prometheus.go:131-174).
    */
  final class Registry {
    private val ns = "cdc"
    private var metrics = Vector.empty[Metric]
    private def counter(sub: String, name: String, help: String) = {
      val c = new Counter(s"${ns}_${sub}_$name", help); metrics :+= c; c
    }
    private def gauge(sub: String, name: String, help: String) = {
      val g = new Gauge(s"${ns}_${sub}_$name", help); metrics :+= g; g
    }
    private def histogram(sub: String, name: String, help: String, buckets: Seq[Double]) = {
      val h = new Histogram(s"${ns}_${sub}_$name", help, buckets); metrics :+= h; h
    }

    // Engine
    val eventsTotal = counter("engine", "events_total",
      "Total number of CDC events processed")
    val batchesPublished = counter("engine", "batches_published_total",
      "Total number of batches published")
    val batchLatency = histogram("engine", "batch_latency_microseconds",
      "Batch publishing latency in microseconds",
      Seq(100, 500, 1000, 5000, 10000, 50000, 100000))
    val transformLatency = histogram("engine", "transform_latency_nanoseconds",
      "Event transformation latency in nanoseconds",
      Seq(100, 500, 1000, 5000, 10000, 50000))
    val partialBatchFailures = counter("engine", "partial_batch_failures_total",
      "Total number of batches with partial success (some items failed and checkpoint was not advanced)")
    val eventsQuarantined = counter("engine", "events_quarantined_total",
      "Total number of events dead-lettered or skipped after a permanent publish failure")
    // Publisher
    val published = counter("publisher", "jetstream_published_total",
      "Total number of messages published to JetStream")
    val ackFailures = counter("publisher", "jetstream_ack_failures_total",
      "Total number of JetStream ack failures")
    val publishRetries = counter("publisher", "publish_retries_total",
      "Total number of publish retry attempts due to transient failures")
    // Parser
    val replicationLag = gauge("parser", "replication_lag_milliseconds",
      "Current replication lag in milliseconds")
    val decodeErrors = counter("parser", "decode_errors_total",
      "Total number of message decode errors")
    val txBufferSize = gauge("parser", "tx_buffer_size",
      "Current number of events buffered in transaction (pgoutput)")
    val txBufferOverflows = counter("parser", "tx_buffer_overflows_total",
      "Total number of transactions that exceeded buffer limit and switched to streaming")
    // WAL reader
    val replicationErrors = counter("wal", "replication_errors_total",
      "Total number of replication errors")
    // Throughput
    val eventsPerSecond = gauge("engine", "events_per_second",
      "Current events processed per second")

    def all: Seq[Metric] = metrics
    def names: Seq[String] = metrics.map(_.name)

    /** Prometheus text exposition format (one scrape page). */
    def scrape: String = metrics.map(_.scrapeBlock).mkString("", "\n", "\n")
  }
}

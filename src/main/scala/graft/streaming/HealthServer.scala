package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{Executors, TimeUnit, TimeoutException}
import scala.jdk.CollectionConverters._
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Driver-side health/readiness/metrics HTTP surface (reference M2:
  * internal/health/server.go:30-91, wired with dependency checks in
  * cmd/cdc-handler/main.go:83-111).
  *
  *  - `/health`: liveness — 200 "ok" while the JVM serves requests.
  *  - `/ready`: readiness — runs the registered checks (each bounded by
  *    `checkTimeout`); any failure -> 503 with "name: error" lines joined
  *    by "; ", exactly the reference's aggregation.
  *  - `/metrics`: the [[CdcMetrics.Registry]] scrape page, standing in for
  *    the reference's promhttp handler.
  *
  * Built on the JDK's HttpServer — the engine's health surface must not
  * depend on executors being up, so it runs on the driver with its own
  * small thread pool. Typical checks mirror the reference's: the
  * checkpoint/slot store is readable, the sink path is writable, the
  * streaming query is active.
  */
object HealthServer {

  final case class Check(name: String, run: () => Unit)

  final class Started(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  def start(port: Int = 8080, checks: Seq[Check] = Nil,
      metrics: Option[CdcMetrics.Registry] = None,
      checkTimeoutMillis: Long = 2000): Started = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val pool = Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-health"); t.setDaemon(true); t
    })
    server.setExecutor(pool)

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
    }

    server.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "ok"))

    server.createContext("/ready", (ex: HttpExchange) => {
      val failures = checks.flatMap { c =>
        val f = pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] =
            try { c.run(); None } catch { case e: Throwable => Some(e.getMessage) }
        })
        try f.get(checkTimeoutMillis, TimeUnit.MILLISECONDS).map(m => s"${c.name}: $m")
        catch {
          case _: TimeoutException => f.cancel(true); Some(s"${c.name}: check timed out")
          case e: Exception => Some(s"${c.name}: $e")
        }
      }
      if (failures.isEmpty) respond(ex, 200, "ready")
      else respond(ex, 503, failures.mkString("; "))
    })

    server.createContext("/metrics", (ex: HttpExchange) =>
      respond(ex, 200, metrics.map(_.scrape).getOrElse("")))

    // pprof analogs (reference mounts net/http/pprof at /debug/pprof,
    // internal/health/server.go:77-78): the JVM equivalents served off
    // the same port via JMX beans — /debug/threads is a full thread dump
    // (goroutine profile analog), /debug/heap a heap + GC summary
    // (heap profile analog). Text exposition, no agent required.
    server.createContext("/debug/threads", (ex: HttpExchange) => {
      val mx = java.lang.management.ManagementFactory.getThreadMXBean
      val dump = mx.dumpAllThreads(mx.isObjectMonitorUsageSupported,
        mx.isSynchronizerUsageSupported)
      respond(ex, 200, dump.map(_.toString).mkString(""))
    })

    server.createContext("/debug/heap", (ex: HttpExchange) => {
      import java.lang.management.ManagementFactory
      val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      val nonHeap = ManagementFactory.getMemoryMXBean.getNonHeapMemoryUsage
      val pools = ManagementFactory.getMemoryPoolMXBeans.asScala.map(p =>
        s"pool ${p.getName}: used=${p.getUsage.getUsed} max=${p.getUsage.getMax}")
      val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala.map(g =>
        s"gc ${g.getName}: count=${g.getCollectionCount} time_ms=${g.getCollectionTime}")
      respond(ex, 200,
        (Seq(s"heap: used=${heap.getUsed} committed=${heap.getCommitted} max=${heap.getMax}",
          s"nonheap: used=${nonHeap.getUsed} committed=${nonHeap.getCommitted}")
          ++ pools ++ gcs).mkString("\n"))
    })

    server.start()
    new Started(server)
  }
}

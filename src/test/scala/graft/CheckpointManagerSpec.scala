package graft

import scala.collection.mutable
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.CheckpointManager

/** Checkpoint policy parity (internal/checkpoint/checkpoint.go +
  * checkpoint_test.go): ack-gated, interval-throttled, flush-pending on
  * shutdown.
  */
class CheckpointManagerSpec extends AnyFunSuite {

  private def mk(interval: FiniteDuration = 1.second) = {
    val saved = mutable.Buffer.empty[String]
    (saved, new CheckpointManager(saved += _, interval))
  }

  test("first acked position flushes immediately; interval throttles the rest") {
    val (saved, m) = mk()
    m.maybeFlush("0/10", acked = true, nowMillis = 0)
    assert(saved.toList == List("0/10"))
    m.maybeFlush("0/20", acked = true, nowMillis = 500) // inside interval
    assert(saved.toList == List("0/10") && m.lastAcked.contains("0/20"))
    m.maybeFlush("0/30", acked = true, nowMillis = 1500) // interval elapsed
    assert(saved.toList == List("0/10", "0/30"))
  }

  test("unacked positions are never recorded or flushed (no data-loss window)") {
    val (saved, m) = mk()
    m.maybeFlush("0/10", acked = false, nowMillis = 0)
    assert(saved.isEmpty && m.lastAcked.isEmpty)
  }

  test("flushPending persists the latest acked position regardless of interval (checkpoint_test.go:26)") {
    val (saved, m) = mk()
    m.maybeFlush("0/10", acked = true, nowMillis = 0)
    m.maybeFlush("0/20", acked = true, nowMillis = 100) // throttled
    m.flushPending(nowMillis = 200)
    assert(saved.toList == List("0/10", "0/20"))
    m.flushPending(nowMillis = 300) // nothing new -> no duplicate save
    assert(saved.toList == List("0/10", "0/20"))
  }

  test("init seeds durable state: no flush until the interval passes again") {
    val (saved, m) = mk()
    m.init("0/5", nowMillis = 0)
    assert(m.lastFlushed.contains("0/5") && saved.isEmpty)
    m.maybeFlush("0/6", acked = true, nowMillis = 100)
    assert(saved.isEmpty, "seeded flush time throttles")
    m.maybeFlush("0/7", acked = true, nowMillis = 1100)
    assert(saved.toList == List("0/7"))
  }
}

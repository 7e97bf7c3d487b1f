package graft

import java.sql.SQLException
import graft.streaming.Reliability

/** Fatal-vs-transient classification, backoff policy and retry loop
  * (reference internal/wal/reader.go:533-592, engine.go:223-226).
  */
class ReliabilitySpec extends SparkSpec {

  test("fatal SQLSTATEs: auth 28xxx, privilege 42501, missing slot 42704") {
    assert(Reliability.isFatalSqlState("28000"))
    assert(Reliability.isFatalSqlState("28P01"))
    assert(Reliability.isFatalSqlState("42501"))
    assert(Reliability.isFatalSqlState("42704"))
    assert(!Reliability.isFatalSqlState("08006")) // connection failure: transient
    assert(!Reliability.isFatalSqlState(null))
  }

  test("fatal classification unwraps causes") {
    val fatal = new RuntimeException("wrap",
      new SQLException("auth failed", "28P01"))
    val transient = new RuntimeException("wrap",
      new SQLException("conn reset", "08006"))
    assert(Reliability.isFatal(fatal))
    assert(!Reliability.isFatal(transient))
  }

  test("publish backoff: 1s·2^(n-1) capped at 8s (engine.go:223-226)") {
    assert((1 to 6).map(Reliability.backoffMillis(_)) ==
      Seq(1000L, 2000L, 4000L, 8000L, 8000L, 8000L))
  }

  test("reconnect backoff: 1s→30s exponential with bounded jitter") {
    (1 to 8).foreach { n =>
      val b = Reliability.reconnectBackoffMillis(n)
      val base = math.min(30000L, 1000L << (n - 1))
      assert(b >= base && b <= base * 3 / 2, s"attempt $n: $b")
    }
  }

  test("withRetry: transient failures retried then succeed; sleeps follow policy") {
    var calls = 0
    val sleeps = scala.collection.mutable.ListBuffer[Long]()
    val out = Reliability.withRetry(maxRetries = 3, sleep = m => sleeps += m)(() => {
      calls += 1
      if (calls < 3) throw new SQLException("net", "08006")
      "ok"
    })
    assert(out == "ok" && calls == 3)
    assert(sleeps.toList == List(1000L, 2000L))
  }

  test("withRetry: fatal errors are never retried") {
    var calls = 0
    val e = intercept[SQLException] {
      Reliability.withRetry(maxRetries = 3, sleep = _ => ())(() => {
        calls += 1
        throw new SQLException("no slot", "42704")
      })
    }
    assert(e.getSQLState == "42704" && calls == 1)
  }

  test("withRetry: retries exhaust then rethrow (engine_test.go:325)") {
    var calls = 0
    intercept[SQLException] {
      Reliability.withRetry(maxRetries = 3, sleep = _ => ())(() => {
        calls += 1
        throw new SQLException("net", "08006")
      })
    }
    assert(calls == 4) // first attempt + 3 retries
  }
}

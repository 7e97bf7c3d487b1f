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

  test("fatal classification reads the socket transport's (SQLSTATE) suffix") {
    // PgWireProtocol.errorString renders "SEVERITY: msg (SQLSTATE)" — the
    // classifier must read it so socket-surfaced auth failures never loop
    assert(Reliability.isFatal(
      new java.io.IOException("FATAL: password authentication failed (28P01)")))
    assert(Reliability.isFatal(new java.io.IOException(
      "FATAL: SCRAM server nonce does not extend client nonce (28000)")))
    assert(!Reliability.isFatal(new java.io.IOException(
      "ERROR: terminating connection due to administrator command (57P01)")))
    assert(!Reliability.isFatal(new java.io.IOException("connection reset")))
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

  test("failure policies: dlq quarantines, skip drops+counts, crash fails the batch") {
    import org.apache.spark.sql.functions._
    import graft.cdc.Dlq
    import spark.implicits._
    val events = Seq(
      ("e1", "ok-payload", "public", "users", "INSERT", "0/1", 1L),
      ("e2", "x" * 100, "public", "users", "INSERT", "0/2", 1L))
      .toDF("event_id", "payload", "schema", "table", "operation", "lsn", "txid")
    val err = Dlq.classify(col("payload"), lit("cdc.db.public.users"), maxPayloadBytes = 50)

    val (ok1, dlq1) = Dlq.applyPolicy(events, err, col("payload"), "db", Dlq.PolicyDlq)
    assert(ok1.count() == 1 && dlq1.count() == 1)
    assert(dlq1.select($"error").as[String].head().startsWith("maximum payload exceeded"))

    var skipped = 0L
    val (ok2, dlq2) = Dlq.applyPolicy(events, err, col("payload"), "db",
      Dlq.PolicySkip, onSkip = skipped = _)
    assert(ok2.count() == 1 && dlq2.count() == 0 && skipped == 1)

    val e = intercept[IllegalStateException] {
      Dlq.applyPolicy(events, err, col("payload"), "db", Dlq.PolicyCrash)
    }
    assert(e.getMessage.contains("crash"))
    // a clean batch passes under crash
    val clean = events.filter($"event_id" === "e1")
    val (ok3, _) = Dlq.applyPolicy(clean, Dlq.classify(col("payload"),
      lit("cdc.db.public.users"), 50), col("payload"), "db", Dlq.PolicyCrash)
    assert(ok3.count() == 1)
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

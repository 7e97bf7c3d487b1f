package graft

import org.apache.spark.sql.functions._
import graft.cdc.{Transform, TxAssembly, Wal2Json}

/** wal2json v2 decode semantics (FIXTURES.md §2 payload shapes,
  * reference internal/parser/wal2json.go).
  */
class Wal2JsonSpec extends SparkSpec {
  import spark.implicits._

  val fixture = Seq(
    (1L, """{"action":"B","xid":12345,"timestamp":"2024-01-15 10:30:00.123456+00"}"""),
    (2L, """{"action":"I","xid":12345,"timestamp":"2024-01-15 10:30:00.123456+00","schema":"public","table":"users","columns":[{"name":"id","type":"bigint","value":1},{"name":"name","type":"text","value":"Test User"},{"name":"is_active","type":"boolean","value":true}]}"""),
    (3L, """{"action":"U","xid":12345,"timestamp":"2024-01-15 10:31:00.123456+00","schema":"public","table":"users","columns":[{"name":"id","type":"bigint","value":1},{"name":"name","type":"text","value":"Updated"}],"identity":[{"name":"id","type":"bigint","value":1}]}"""),
    (4L, """{"action":"D","xid":12345,"timestamp":"2024-01-15 10:32:00.123456+00","schema":"public","table":"users","identity":[{"name":"id","type":"bigint","value":1}]}"""),
    (5L, """{"action":"X","xid":1}"""), // unknown action: dropped
    (6L, """{"action":"T","xid":12345,"timestamp":"2024-01-15 10:33:00+00","schema":"public","table":"users"}"""),
    (7L, """{"action":"C","xid":12345,"timestamp":"2024-01-15 10:30:00.123456+00"}"""))

  def decoded = Wal2Json.decode(fixture.toDF("wal_start", "data"))

  test("actions map to operations; unknown actions dropped (wal2json.go:166-168)") {
    val ops = decoded.orderBy($"wal_start").select($"operation").as[String].collect()
    assert(ops.toList == List("B", "INSERT", "UPDATE", "DELETE", "DDL", "C"))
  }

  test("malformed JSON: lenient default drops, strict is fatal (wal2json.go:67-74)") {
    val noisy = fixture ++ Seq(
      (8L, "this is not json"),
      (9L, """{"truncated": """))
    val ops = Wal2Json.decode(noisy.toDF("wal_start", "data"))
      .orderBy($"wal_start").select($"operation").as[String].collect()
    assert(ops.toList == List("B", "INSERT", "UPDATE", "DELETE", "DDL", "C"),
      "garbage lines must not surface as events or errors by default")
    // strict mode mirrors the reference's fatal decode-error classification
    val e = intercept[Exception] {
      Wal2Json.decode(noisy.toDF("wal_start", "data"), strict = true)
        .select($"operation").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("Malformed records") ||
      m.contains("MALFORMED_RECORD")), messages(e))
    // and a fully-valid stream decodes identically under strict
    val strictOps = Wal2Json.decode(fixture.toDF("wal_start", "data"), strict = true)
      .orderBy($"wal_start").select($"operation").as[String].collect()
    assert(strictOps.toList == List("B", "INSERT", "UPDATE", "DELETE", "DDL", "C"))
  }

  test("JSON scalar values degrade to strings (wal2json.go:236-240)") {
    val ins = decoded.filter($"operation" === "INSERT").collect()(0)
    val nv = ins.getAs[Map[String, String]]("new_values")
    assert(nv == Map("id" -> "1", "name" -> "Test User", "is_active" -> "true"))
  }

  test("update carries identity as old values; delete has no new values") {
    val upd = decoded.filter($"operation" === "UPDATE").collect()(0)
    assert(upd.getAs[Map[String, String]]("old_values") == Map("id" -> "1"))
    assert(upd.getAs[Map[String, String]]("new_values")("name") == "Updated")
    val del = decoded.filter($"operation" === "DELETE").collect()(0)
    assert(del.getAs[Map[String, String]]("old_values") == Map("id" -> "1"))
    assert(del.getAs[Map[String, String]]("new_values") == null)
  }

  test("truncate becomes DDL with empty (not null) images") {
    val ddl = decoded.filter($"operation" === "DDL").collect()(0)
    assert(ddl.getAs[Map[String, String]]("old_values") == Map.empty[String, String])
    assert(ddl.getAs[Map[String, String]]("new_values") == Map.empty[String, String])
  }

  test("table allowlist filter passes markers and allowed tables only (F1)") {
    val extra = Seq((8L, """{"action":"I","xid":1,"timestamp":"2024-01-15 10:30:00+00","schema":"public","table":"other","columns":[{"name":"id","type":"bigint","value":2}]}"""))
    val df = Wal2Json.decode((fixture ++ extra).toDF("wal_start", "data"))
    val kept = Wal2Json.filterTables(df, Seq("public.users"))
    assert(kept.filter($"table_name" === "other").count() == 0)
    assert(kept.filter($"is_begin" || $"is_commit").count() == 2)
    // empty allowlist = pass-all (wal2json.go:173-179)
    assert(Wal2Json.filterTables(df, Nil).count() == df.count())
  }

  test("full batch pipeline: assemble + normalize produce the wire envelope") {
    val events = Transform.normalize(TxAssembly.assemble(decoded), "testdb")
      .orderBy($"lsn")
    val rows = events.collect()
    assert(rows.length == 4)
    val first = rows(0)
    // event_id = lsn:txid:op:schema.table:seq (transformer.go:85-106)
    assert(first.getAs[String]("event_id") == "0/2:12345:INSERT:public.users:0")
    assert(first.getAs[String]("event_type") == "cdc.insert")
    assert(first.getAs[String]("subject") == "cdc.testdb.public.users")
    // commit metadata stamped from the commit marker
    assert(rows.forall(_.getAs[java.sql.Timestamp]("commit_time").toInstant.toString
      == "2024-01-15T10:30:00.123456Z"))
    // two events in one tx get distinct seq -> distinct ids (cdc_dedup_test.go:118-163)
    assert(rows.map(_.getAs[String]("event_id")).distinct.length == 4)
  }
}

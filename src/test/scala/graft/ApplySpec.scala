package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc.Apply
import graft.streaming.{CdcStream, MaterializedView}

/** CDC apply (MERGE-shape) semantics: WAL-order winner, DELETE removes,
  * INSERT/UPDATE replaces, untouched keys keep their base image, keys can
  * be born in the batch.
  */
class ApplySpec extends SparkSpec {
  import spark.implicits._

  private def img(v: String) = map(lit("v"), lit(v))

  test("applyChanges: winner per key, deletes, inserts, untouched") {
    val base = Seq(("t", 1L, "a"), ("t", 2L, "b"), ("t", 3L, "c"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    // key 1: UPDATE(seq 10) then DELETE(seq 20) -> removed
    // key 2: DELETE(seq 10) then UPDATE(seq 20) -> updated (WAL order wins)
    // key 3: untouched -> base image survives
    // key 4: INSERT only in the batch -> born
    val changes = Seq(
      ("t", 1L, "UPDATE", Some("a2"), 10L),
      ("t", 1L, "DELETE", None, 20L),
      ("t", 2L, "DELETE", None, 10L),
      ("t", 2L, "UPDATE", Some("b2"), 20L),
      ("t", 4L, "INSERT", Some("d"), 5L))
      .toDF("tbl", "uid", "operation", "v", "seq")
      .select($"tbl", $"uid", $"operation",
        when($"v".isNotNull, map(lit("v"), $"v")).as("after"), $"seq")
    val out = Apply.applyChanges(base, $"img", changes, $"after", $"seq",
        Seq("tbl", "uid"))
      .select($"uid", element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("property: applyChanges equals a naive per-key fold (seeded random)") {
    val rnd = new scala.util.Random(42)
    val keys = (1L to 60L)
    val base = keys.filter(_ => rnd.nextBoolean())
      .map(k => ("t", k, s"base$k")).toList
    val ops = Array("INSERT", "UPDATE", "DELETE")
    val changes = (1 to 300).map { i =>
      val k = keys(rnd.nextInt(keys.size))
      val op = ops(rnd.nextInt(3))
      ("t", k, op, if (op == "DELETE") None else Some(s"v$i"), i.toLong)
    }.toList
    // naive reference: per key, the highest-seq change decides
    val expected: Map[Long, String] = {
      val winners = changes.groupBy(_._2).map { case (k, cs) => k -> cs.maxBy(_._5) }
      val baseMap = base.map(t => t._2 -> t._3).toMap
      val born = winners.collect {
        case (k, (_, _, op, Some(v), _)) if op != "DELETE" => k -> v
      }
      val survivingBase = baseMap.filter { case (k, _) =>
        winners.get(k).forall(_._3 != "DELETE") }
      (survivingBase ++ born).toMap
    }
    val baseDf = base.toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val chDf = changes.toDF("tbl", "uid", "operation", "v", "seq")
      .select($"tbl", $"uid", $"operation",
        when($"v".isNotNull, map(lit("v"), $"v")).as("after"), $"seq")
    val got = Apply.applyChanges(baseDf, $"img", chDf, $"after", $"seq",
        Seq("tbl", "uid"))
      .select($"uid", element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected,
      s"diff: extra=${got.toSet -- expected.toSet} missing=${expected.toSet -- got.toSet}")
  }

  test("netChanges: all four compaction arms, one agg, final images") {
    // key 1: I,U,U -> INSERT w/ last image; key 2: I,D -> vanishes;
    // key 3: U,U -> UPDATE w/ last; key 4: U,D -> DELETE, null image;
    // key 5: single I -> INSERT
    val ch = Seq(
      (1L, "INSERT", 1L, "a1"), (1L, "UPDATE", 2L, "a2"), (1L, "UPDATE", 3L, "a3"),
      (2L, "INSERT", 4L, "b1"), (2L, "DELETE", 5L, null),
      (3L, "UPDATE", 6L, "c1"), (3L, "UPDATE", 7L, "c2"),
      (4L, "UPDATE", 8L, "d1"), (4L, "DELETE", 9L, null),
      (5L, "INSERT", 10L, "e1"))
      .toDF("k", "op", "pos", "img")
    val got = Apply.netChanges(ch, Seq($"k"), $"op", $"pos", $"img")
      .select($"k", $"net_op", $"last_image", $"n_changes")
      .as[(Long, String, Option[String], Long)].collect().sortBy(_._1)
    assert(got.toList == List(
      (1L, "INSERT", Some("a3"), 3L),
      (3L, "UPDATE", Some("c2"), 2L),
      (4L, "DELETE", None, 2L),
      (5L, "INSERT", Some("e1"), 1L)))
  }

  test("diff emits I/U/D and round-trips through applyChanges") {
    val oldV = Seq(("t", 1L, "a"), ("t", 2L, "b"), ("t", 3L, "c"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val newV = Seq(("t", 2L, "b2"), ("t", 3L, "c"), ("t", 4L, "d"))
      .toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val changes = Apply.diff(oldV, $"img", newV, $"img", Seq("tbl", "uid"))
    val ops = changes.collect()
      .map(r => r.getAs[Long]("uid") -> r.getAs[String]("operation")).toMap
    // key 1 dropped, key 2 changed, key 3 unchanged (no row), key 4 born
    assert(ops == Map(1L -> "DELETE", 2L -> "UPDATE", 4L -> "INSERT"))
    // round-trip: applying the diff to old reproduces new exactly
    val applied = Apply.applyChanges(oldV, $"img",
        changes.withColumn("seq", lit(1L)), $"after", $"seq", Seq("tbl", "uid"))
      .select($"uid", element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied == Map(2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("incremental materialized view: foreachBatch + applyChanges across restart") {
    // the table-format-free IVM pattern: each micro-batch folds onto the
    // latest state VERSION (v<batchId>); replaying a batch overwrites its
    // own version (idempotent), restart resumes from the checkpoint
    val dir = Files.createTempDirectory("graft_ivm").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def line(ws: Long, action: String, key: Long, v: String): (Long, String) = {
      val ts = "2024-01-15 10:30:00.123456+00"
      val cols = s"""[{"name":"id","type":"bigint","value":"$key"},{"name":"v","type":"text","value":"$v"}]"""
      val arms = action match {
        case "D" => s""""identity":$cols"""
        case _   => s""""columns":$cols"""
      }
      (ws, s"""{"action":"$action","xid":$key,"timestamp":"$ts","schema":"public","table":"kv",$arms}""")
    }
    def tx(ws: Long, action: String, key: Long, v: String) = Seq(
      (ws, s"""{"action":"B","xid":$key,"timestamp":"2024-01-15 10:30:00.123456+00"}"""),
      line(ws + 1, action, key, v),
      (ws + 2, s"""{"action":"C","xid":$key,"timestamp":"2024-01-15 10:30:00.123456+00"}"""))

    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"), seq = col("txid"),
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }

    (tx(10, "I", 1, "a") ++ tx(20, "I", 2, "b") ++ tx(30, "I", 3, "c"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    (tx(40, "U", 2, "b2") ++ tx(50, "D", 3, "") ++ tx(60, "I", 4, "d"))
      .toDF("wal_start", "data").write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val finalState = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long").as("id"), element_at($"image", "v").as("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(finalState == Map(1L -> "a", 2L -> "b2", 4L -> "d"),
      s"update applied, delete removed, insert born, untouched kept: $finalState")
  }

  test("streaming SCD2 history: foreachBatch + scd2Apply across restart") {
    val dir = Files.createTempDirectory("graft_scd2s").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def line(ws: Long, action: String, key: Long, v: String): (Long, String) = {
      val ts = "2024-01-15 10:30:00.123456+00"
      val cols = s"""[{"name":"id","type":"bigint","value":"$key"},{"name":"v","type":"text","value":"$v"}]"""
      val arms = action match {
        case "D" => s""""identity":$cols"""
        case _   => s""""columns":$cols"""
      }
      (ws, s"""{"action":"$action","xid":$key,"timestamp":"$ts","schema":"public","table":"kv",$arms}""")
    }
    def tx(ws: Long, action: String, key: Long, v: String) = Seq(
      (ws, s"""{"action":"B","xid":$key,"timestamp":"2024-01-15 10:30:00.123456+00"}"""),
      line(ws + 1, action, key, v),
      (ws + 2, s"""{"action":"C","xid":$key,"timestamp":"2024-01-15 10:30:00.123456+00"}"""))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    (tx(10, "I", 1, "a") ++ tx(20, "I", 2, "b") ++ tx(30, "I", 3, "c"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    (tx(40, "U", 2, "b2") ++ tx(50, "D", 3, "") ++ tx(60, "I", 4, "d"))
      .toDF("wal_start", "data").write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val hist = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long").as("id"), element_at($"image", "v").as("v"),
        $"valid_from", $"valid_to", $"is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    // seq = numeric LSN of each data row (ws+1); a restart between the
    // batches must not lose, duplicate, or re-open versions
    assert(hist == Set(
      (1L, "a", 11L, -1L, true),
      (2L, "b", 21L, 41L, false), (2L, "b2", 41L, -1L, true),
      (3L, "c", 31L, 51L, false),
      (4L, "d", 61L, -1L, true)),
      s"history across restart: $hist")
  }

  test("scd2: versions open/close in WAL order, DELETE closes without opening") {
    // key 1: I(10) U(20) D(30)  -> two closed versions, no current row
    // key 2: I(10) U(20) U(40)  -> two closed + one current
    // key 3: I(10)             -> one current version
    val changes = Seq(
      ("t", 1L, "INSERT", "a1", 10L), ("t", 1L, "UPDATE", "a2", 20L),
      ("t", 1L, "DELETE", null, 30L),
      ("t", 2L, "INSERT", "b1", 10L), ("t", 2L, "UPDATE", "b2", 20L),
      ("t", 2L, "UPDATE", "b3", 40L),
      ("t", 3L, "INSERT", "c1", 10L))
      .toDF("tbl", "uid", "operation", "v", "seq")
    val out = Apply.scd2(changes, Seq("tbl", "uid"), $"operation", $"seq", $"v")
      .select($"uid", $"image", $"valid_from", $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(out == Set(
      (1L, "a1", 10L, 20L, false), (1L, "a2", 20L, 30L, false),
      (2L, "b1", 10L, 20L, false), (2L, "b2", 20L, 40L, false),
      (2L, "b3", 40L, -1L, true),
      (3L, "c1", 10L, -1L, true)))
    // exactly one current version per live key, none for deleted keys
    val currents = Apply.scd2(changes, Seq("tbl", "uid"), $"operation",
        $"seq", $"v")
      .filter($"is_current").groupBy($"uid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(currents == Map(2L -> 1L, 3L -> 1L))
  }

  test("property: scd2Apply(scd2(prefix), suffix) == scd2(full) (seeded random)") {
    val rnd = new scala.util.Random(7)
    val ops = Array("INSERT", "UPDATE", "DELETE")
    val changes = (1 to 400).map { seq =>
      val k = 1L + rnd.nextInt(40)
      (("t", k, ops(rnd.nextInt(3)), s"v$seq", seq.toLong))
    }
    val df = changes.toDF("tbl", "uid", "operation", "v", "seq")
    def canon(h: org.apache.spark.sql.DataFrame) =
      h.select($"uid", $"image", $"valid_from", $"valid_to", $"is_current")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    for (cut <- Seq(100L, 250L, 399L)) {
      val full = Apply.scd2(df, Seq("tbl", "uid"), $"operation", $"seq", $"v")
      val incr = Apply.scd2Apply(
        Apply.scd2(df.filter($"seq" <= cut), Seq("tbl", "uid"),
          $"operation", $"seq", $"v"),
        df.filter($"seq" > cut), Seq("tbl", "uid"),
        $"operation", $"seq", $"v")
      assert(canon(incr) == canon(full),
        s"cut=$cut: incremental history must equal the full rebuild")
    }
  }

  // ---- bucketed-state scale property: a batch touching k of N buckets
  // rewrites ONLY those k (plus, for SCD2, its own closed-log append) ----

  private def walJson(ws: Long, action: String, key: Long, v: String) = {
    val ts = "2024-01-15 10:30:00.123456+00"
    val cols = s"""[{"name":"id","type":"bigint","value":"$key"},{"name":"v","type":"text","value":"$v"}]"""
    val arms = action match {
      case "D" => s""""identity":$cols"""
      case _   => s""""columns":$cols"""
    }
    Seq(
      (ws, s"""{"action":"B","xid":$key,"timestamp":"$ts"}"""),
      (ws + 1, s"""{"action":"$action","xid":$key,"timestamp":"$ts","schema":"public","table":"kv",$arms}"""),
      (ws + 2, s"""{"action":"C","xid":$key,"timestamp":"$ts"}"""))
  }

  /** (version-dir name, part-file names) per bucket dir under root. */
  private def bucketListing(root: String): Map[String, Set[String]] = {
    val r = new java.io.File(root)
    Option(r.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches("b\\d+"))
      .flatMap { b =>
        Option(b.listFiles()).toSeq.flatten.filter(_.getName.matches("v\\d+"))
          .map { v =>
            s"${b.getName}/${v.getName}" ->
              Option(v.listFiles()).toSeq.flatten.map(_.getName).toSet
          }
      }.toMap
  }

  private def bucketOfStringKey(k: Long, buckets: Int): Int =
    spark.range(1).select(pmod(hash(lit(k.toString)), lit(buckets)))
      .head().getInt(0)

  test("bucketed MV: a batch touching one bucket rewrites only that bucket") {
    val dir = Files.createTempDirectory("graft_ivm_bk").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"), seq = col("txid"), buckets = 8,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    val keys = (1L to 12L)
    keys.flatMap(k => walJson(k * 10, "I", k, s"v$k"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    val before = bucketListing(state)
    assert(before.nonEmpty, "batch 0 materialized bucketed state")

    // batch 1 updates ONE key -> exactly that key's bucket gains v1
    walJson(500, "U", 7L, "v7b").toDF("wal_start", "data")
      .write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val after = bucketListing(state)
    val touchedBucket = s"b${bucketOfStringKey(7L, 8)}"
    val newDirs = after.keySet -- before.keySet
    assert(newDirs.size == 1 && newDirs.head.startsWith(s"$touchedBucket/v"),
      s"only the touched bucket gains a version: $newDirs")
    before.keys.foreach { d =>
      assert(after(d) == before(d),
        s"pre-existing version dir $d must be untouched byte-for-byte names")
    }
    // and the fold is still correct
    val got = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == keys.map(k => k -> (if (k == 7L) "v7b" else s"v$k")).toMap)
  }

  test("bootstrap seeds the state: stream folds on the snapshot, bootstrap-after-start refused") {
    val dir = Files.createTempDirectory("graft_ivm_boot").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // consistent snapshot: keys 1..6 at their initial images
    val snapshot = (1L to 6L).map(k =>
      (k.toString, Map("id" -> k.toString, "v" -> s"snap$k")))
      .toDF("id", "image")
    MaterializedView.bootstrap(spark, snapshot, state, Seq("id"), buckets = 4)
    // snapshot alone IS current state
    val seeded = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(seeded == (1L to 6L).map(k => k -> s"snap$k").toMap)
    // CDC on top: update 2, delete 5, insert 9 — fold must see the seed
    (walJson(10, "U", 2L, "u2") ++ walJson(20, "D", 5L, "") ++
      walJson(30, "I", 9L, "v9"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val raw = spark.readStream
      .schema("wal_start LONG, data STRING").json(s"$src/*.json")
    val q = MaterializedView.start(spark,
      CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
      keyCols = Seq("id"), seq = col("txid"), buckets = 4,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try q.processAllAvailable() finally q.stop()
    val got = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "snap1", 2L -> "u2", 3L -> "snap3",
      4L -> "snap4", 6L -> "snap6", 9L -> "v9"),
      s"snapshot + changes fold: $got")
    // bootstrap is the t=0 step only
    val e = intercept[IllegalArgumentException] {
      MaterializedView.bootstrap(spark, snapshot, state, Seq("id"), buckets = 4)
    }
    assert(e.getMessage.contains("already has versions"))
  }

  test("bootstrapScd2 seeds open history: first batch closes seeded versions, asOf sees them") {
    val dir = Files.createTempDirectory("graft_scd2_boot").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // snapshot at position 5: keys 1..4 open from seq 5
    val snapshot = (1L to 4L).map(k =>
      (k.toString, Map("id" -> k.toString, "v" -> s"snap$k")))
      .toDF("id", "image")
    MaterializedView.bootstrapScd2(spark, snapshot, state, Seq("id"),
      validFrom = lit(5L), buckets = 4)
    // stream: update key 2 at position 10, delete key 3 at position 20
    // (walJson reuses the key as xid; here the xid IS the seq position,
    // past the snapshot's consistent point 5)
    def walAt(pos: Long, action: String, key: Long, v: String) = {
      val ts = "2024-01-15 10:30:00.123456+00"
      val cols = s"""[{"name":"id","type":"bigint","value":"$key"},{"name":"v","type":"text","value":"$v"}]"""
      val arms = if (action == "D") s""""identity":$cols"""
        else s""""columns":$cols"""
      Seq(
        (pos, s"""{"action":"B","xid":$pos,"timestamp":"$ts"}"""),
        (pos + 1, s"""{"action":"$action","xid":$pos,"timestamp":"$ts","schema":"public","table":"kv",$arms}"""),
        (pos + 2, s"""{"action":"C","xid":$pos,"timestamp":"$ts"}"""))
    }
    (walAt(10, "U", 2L, "u2") ++ walAt(20, "D", 3L, ""))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val raw = spark.readStream
      .schema("wal_start LONG, data STRING").json(s"$src/*.json")
    val q = MaterializedView.startScd2(spark,
      CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
      keyCols = Seq("id"), seq = col("txid"), buckets = 4,
      trigger = Trigger.ProcessingTime("50 milliseconds"))
    try q.processAllAvailable() finally q.stop()
    // as of t=7 (after snapshot, before the changes): the snapshot world
    val at7 = MaterializedView.scd2AsOf(spark, state, Seq("id"), t = 7L)
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at7 == (1L to 4L).map(k => k -> s"snap$k").toMap, s"asOf 7: $at7")
    // as of t=25: update applied, delete closed key 3 with no successor
    val at25 = MaterializedView.scd2AsOf(spark, state, Seq("id"), t = 25L)
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at25 == Map(1L -> "snap1", 2L -> "u2", 4L -> "snap4"),
      s"asOf 25: $at25")
    // the seeded version of key 2 is CLOSED at the update's position
    val k2 = MaterializedView.keyState(spark, state, Seq("id"), Seq("2"))
      .select(element_at($"image", "v"), $"valid_from".cast("long"),
        $"valid_to".cast("long"), $"is_current").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
    assert(k2 == Set(("snap2", 5L, 10L, false), ("u2", 10L, -1L, true)),
      s"key 2 history: $k2")
    // re-bootstrap refused once state exists
    val e = intercept[IllegalArgumentException] {
      MaterializedView.bootstrapScd2(spark, snapshot, state, Seq("id"),
        validFrom = lit(5L), buckets = 4)
    }
    assert(e.getMessage.contains("already has versions"))
  }

  test("bucketed MV: deleting a bucket's only key leaves a bare version (no resurrection)") {
    val dir = Files.createTempDirectory("graft_ivm_del").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"), seq = col("txid"), buckets = 8,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    // two keys in DIFFERENT buckets (probe until found)
    val k1 = 1L
    val k2 = (2L to 40L).find(k =>
      bucketOfStringKey(k, 8) != bucketOfStringKey(k1, 8)).get
    (walJson(10, "I", k1, "a") ++ walJson(20, "I", k2, "b"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    walJson(30, "D", k1, "").toDF("wal_start", "data").write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val got = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long")).collect().map(_.getLong(0)).toSet
    assert(got == Set(k2),
      s"the deleted key must not resurrect from the bucket's previous version: $got")
  }

  test("bucketed MV: a replayed batch (crash between state write and commit) is idempotent") {
    // the at-least-once contract's hard case: batch 1's bucket versions
    // were WRITTEN but its checkpoint commit never landed. Simulate by
    // deleting the commit marker; the restarted query replays batch 1,
    // which must overwrite its own v1 in exactly the touched buckets
    // (reading each bucket's version BELOW 1) and converge to the same
    // state — no duplicates, no double-fold.
    val dir = Files.createTempDirectory("graft_ivm_replay").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"), seq = col("txid"), buckets = 8,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    (walJson(10, "I", 1L, "a") ++ walJson(20, "I", 2L, "b"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    (walJson(30, "U", 1L, "a2") ++ walJson(40, "I", 3L, "c"))
      .toDF("wal_start", "data").write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    def readState() = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id".cast("long"), element_at($"image", "v")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val committed = readState()
    // crash simulation: the engine never saw the last batch commit
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    val last = commits.last
    assert(last.delete(), s"failed to delete commit marker $last")
    // the local FS keeps a checksum sidecar; a stale one trips Spark's
    // concurrent-modification guard when the replay re-commits the batch
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) { crc.delete(); () }
    val q3 = startQuery(); q3.processAllAvailable(); q3.stop()
    assert(readState() == committed,
      s"replay must converge to the identical state: $committed vs ${readState()}")
    // and no bucket carries duplicate rows for a key
    val dup = MaterializedView.currentState(spark, state, Seq("id"))
      .groupBy($"id").count().filter($"count" > 1).count()
    assert(dup == 0L, "no key appears twice after replay")
  }

  test("bucket count is pinned in state: restart with a different N is rejected") {
    val dir = Files.createTempDirectory("graft_pin").toString
    val src = s"$dir/in"; val state = s"$dir/state"
    Files.createDirectories(java.nio.file.Paths.get(src))
    walJson(10, "I", 1L, "a").toDF("wal_start", "data").write.json(s"$src/b0.json")
    def startQuery(buckets: Int) = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, s"$dir/ckpt$buckets",
        keyCols = Seq("id"), seq = col("txid"), buckets = buckets,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    val q = startQuery(8); q.processAllAvailable(); q.stop()
    val e = intercept[IllegalArgumentException] { startQuery(4) }
    assert(e.getMessage.contains("bucketed with N=8"),
      s"hash layout is only stable under one N: ${e.getMessage}")
    // retention below the replay-coverage bound is rejected up front
    intercept[IllegalArgumentException] {
      MaterializedView.start(spark,
        spark.readStream.schema("wal_start LONG, data STRING").json(s"$src/*.json"),
        state, s"$dir/ckpt_r", keyCols = Seq("id"), seq = col("txid"),
        retainVersions = 1)
    }
  }

  test("bucketed SCD2: closed log appends, only touched open buckets rewrite") {
    val dir = Files.createTempDirectory("graft_scd2_bk").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 8, trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    val keys = (1L to 12L)
    keys.flatMap(k => walJson(k * 10, "I", k, s"v$k"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    val openBefore = bucketListing(s"$state/open")
    def closedListing() = {
      val c = new java.io.File(s"$state/closed")
      Option(c.listFiles()).toSeq.flatten.filter(_.getName.matches("v\\d+"))
        .map(v => v.getName ->
          Option(v.listFiles()).toSeq.flatten.map(_.getName).toSet).toMap
    }
    val closedBefore = closedListing()

    walJson(500, "U", 7L, "v7b").toDF("wal_start", "data")
      .write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val openAfter = bucketListing(s"$state/open")
    val touchedBucket = s"b${bucketOfStringKey(7L, 8)}"
    val newOpen = openAfter.keySet -- openBefore.keySet
    assert(newOpen.size == 1 && newOpen.head.startsWith(s"$touchedBucket/v"),
      s"only the touched open bucket gains a version: $newOpen")
    openBefore.keys.foreach { d =>
      assert(openAfter(d) == openBefore(d), s"untouched open bucket $d rewritten")
    }
    val closedAfter = closedListing()
    assert((closedAfter.keySet -- closedBefore.keySet).size == 1,
      "the closed log APPENDS the batch's own closed versions")
    closedBefore.foreach { case (d, files) =>
      assert(closedAfter(d) == files, s"closed log $d must never be rewritten")
    }
    // history content: key 7 has a closed v7 version and an open v7b one
    val hist = MaterializedView.currentState(spark, state, Seq("id"))
      .filter($"id" === "7")
      .select(element_at($"image", "v"), $"is_current").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(hist == Set(("v7", false), ("v7b", true)),
      s"closed + open versions across the split: $hist")
  }

  test("bucketed SCD2: delete of a bucket's only key then re-touch does not wedge") {
    // regression: a DELETE of a bucket's only live key leaves a BARE open
    // version dir (no part files); a later batch touching that bucket
    // must treat it as empty open state (fold via scd2 over the batch
    // alone), not die on schema inference — which would replay forever
    val dir = Files.createTempDirectory("graft_scd2_retouch").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 8, trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    walJson(10, "I", 1L, "a").toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    walJson(30, "D", 1L, "").toDF("wal_start", "data").write.json(s"$src/b1.json")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    // the bucket's open state is now a bare version dir; re-insert the key
    walJson(50, "I", 1L, "a2").toDF("wal_start", "data").write.json(s"$src/b2.json")
    val q3 = startQuery(); q3.processAllAvailable(); q3.stop()
    val hist = MaterializedView.currentState(spark, state, Seq("id"))
      .select(element_at($"image", "v"), $"valid_from",
        $"valid_to", $"is_current").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
    assert(hist == Set(("a", 11L, 31L, false), ("a2", 51L, -1L, true)),
      s"insert-delete-reinsert history: $hist")
  }

  private def closedDirNames(state: String): Set[String] = {
    val c = new java.io.File(s"$state/closed")
    Option(c.listFiles()).toSeq.flatten.filter(_.isDirectory)
      .map(_.getName).toSet
  }

  test("SCD2 closed-log compaction: segments bound the directory count, reads stay identical") {
    val dir = Files.createTempDirectory("graft_scd2_compact").toString
    val src = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery(state: String, ckpt: String, k: Int) = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 4, compactClosedAfter = k, compactEveryBatches = 1,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    // 6 micro-batches, each updating both keys -> every batch closes rows
    val stateC = s"$dir/state_c"; val stateU = s"$dir/state_u"
    for (b <- 0 until 6) {
      (walJson(100 * b + 10, if (b == 0) "I" else "U", 1L, s"a$b") ++
       walJson(100 * b + 20, if (b == 0) "I" else "U", 2L, s"b$b"))
        .toDF("wal_start", "data").write.json(s"$src/b$b.json")
      val qc = startQuery(stateC, s"$dir/ckpt_c", 2)
      qc.processAllAvailable(); qc.stop()
      val qu = startQuery(stateU, s"$dir/ckpt_u", 100)
      qu.processAllAvailable(); qu.stop()
    }
    val compacted = closedDirNames(stateC)
    val uncompacted = closedDirNames(stateU)
    assert(uncompacted.size == 6 && uncompacted.forall(_.startsWith("v")),
      s"control run keeps one dir per batch: $uncompacted")
    assert(compacted.size <= 4,
      s"6 batches at K=2 must leave a bounded closed log (tiered segments): $compacted")
    assert(compacted.exists(_.startsWith("s")), s"segments exist: $compacted")
    def canon(state: String) = MaterializedView
      .currentState(spark, state, Seq("id"))
      .select($"id", element_at($"image", "v"), $"valid_from", $"valid_to",
        $"is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(canon(stateC) == canon(stateU),
      "compaction is a pure rewrite: the history reads back identically")
    // 5 closed versions per key (6 changes): content sanity
    assert(canon(stateC).count(!_._5) == 10, s"10 closed rows: ${canon(stateC)}")
  }

  test("keyState prunes to the key's bucket: one open bucket dir, segment partitions only") {
    val dir = Files.createTempDirectory("graft_keystate").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.start(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"), seq = col("txid"), buckets = 8,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    val keys = (1L to 12L)
    keys.flatMap(k => walJson(k * 10, "I", k, s"v$k"))
      .toDF("wal_start", "data").write.json(s"$src/b0.json")
    val q = startQuery(); q.processAllAvailable(); q.stop()
    val df = MaterializedView.keyState(spark, state, Seq("id"), Seq("7"))
    val wantBucket = s"/b${bucketOfStringKey(7L, 8)}/"
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(wantBucket)),
      s"single-key read must list only the key's bucket: ${files.toSeq}")
    val got = df.select(element_at($"image", "v")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("v7"), s"key 7's image: ${got.toSeq}")
  }

  test("keyState on compacted SCD2 state reads only the key's segment partitions") {
    val dir = Files.createTempDirectory("graft_keystate_scd2").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 4, compactClosedAfter = 2, compactEveryBatches = 1,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    for (b <- 0 until 5) {
      (walJson(100 * b + 10, if (b == 0) "I" else "U", 1L, s"a$b") ++
       walJson(100 * b + 20, if (b == 0) "I" else "U", 2L, s"b$b"))
        .toDF("wal_start", "data").write.json(s"$src/b$b.json")
      val q = startQuery(); q.processAllAvailable(); q.stop()
    }
    val b1 = bucketOfStringKey(1L, 4)
    val df = MaterializedView.keyState(spark, state, Seq("id"), Seq("1"))
    val files = df.inputFiles
    // segment files must come from the key's bucket partition only
    val segFiles = files.filter(_.contains("/closed/s"))
    assert(segFiles.nonEmpty, s"compacted segments are read: ${files.toSeq}")
    assert(segFiles.forall(_.contains(s"_mv_bucket=$b1")),
      s"segment reads prune to the key's partition: ${segFiles.toSeq}")
    // open-side files only from the key's bucket
    val openFiles = files.filterNot(f =>
      f.contains("/closed/"))
    assert(openFiles.forall(_.contains(s"/b$b1/")),
      s"open reads prune to the key's bucket: ${openFiles.toSeq}")
    // full history for key 1 present (5 versions: 4 closed + 1 open)
    assert(df.count() == 5, s"key 1 history rows: ${df.count()}")
    // and equals the unpruned read filtered to the key
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select(element_at($"image", "v"), $"valid_from", $"valid_to",
        $"is_current").collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSet
    assert(canon(df) == canon(MaterializedView
      .currentState(spark, state, Seq("id")).filter($"id" === "1")))
  }

  test("scd2AsOf: validity-interval read matches the filter, expired segments prune away") {
    val dir = Files.createTempDirectory("graft_asof").toString
    val src = s"$dir/in"; val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery() = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 4, compactClosedAfter = 2, compactEveryBatches = 1,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    for (b <- 0 until 6) {
      (walJson(100 * b + 10, if (b == 0) "I" else "U", 1L, s"a$b") ++
       walJson(100 * b + 20, if (b == 0) "I" else "U", 2L, s"b$b"))
        .toDF("wal_start", "data").write.json(s"$src/b$b.json")
      val q = startQuery(); q.processAllAvailable(); q.stop()
    }
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"id", element_at($"image", "v")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    for (t <- Seq(11L, 21L, 215L, 521L, 10000L)) {
      val asOf = MaterializedView.scd2AsOf(spark, state, Seq("id"), t)
      val manual = MaterializedView.currentState(spark, state, Seq("id"))
        .filter($"valid_from" <= t && ($"valid_to".isNull || $"valid_to" > t))
      assert(canon(asOf) == canon(manual), s"asOf($t): ${canon(asOf)}")
      if (t >= 21L)
        assert(canon(asOf).size == 2, s"both keys live at t=$t")
    }
    // at t past all closed intervals, every segment's meta excludes it:
    // only open-version (and residual uncompacted) files are listed
    val late = MaterializedView.scd2AsOf(spark, state, Seq("id"), 10000L)
    val segFiles = late.inputFiles.filter(_.contains("/closed/s"))
    assert(segFiles.isEmpty,
      s"expired segments are pruned from the listing: ${segFiles.toSeq}")
  }

  test("scd2Apply plan: the lead window runs over the batch only, history joins") {
    // the incremental fold must never re-window history — exactly one
    // Window (scd2 over the change batch); the history side contributes
    // a key join against the batch-key aggregate, nothing sorted
    val history = Apply.scd2(
      (1L to 200L).map(k => ("t", k, "INSERT", s"v$k", k)).toDF(
        "tbl", "uid", "operation", "v", "seq"),
      Seq("tbl", "uid"), $"operation", $"seq", $"v")
    val batch = Seq(("t", 1L, "UPDATE", "x", 1000L))
      .toDF("tbl", "uid", "operation", "v", "seq")
    val df = Apply.scd2Apply(history, batch, Seq("tbl", "uid"),
      $"operation", $"seq", $"v")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).size == 2,
      s"two windows total: one inside the prior history build, one over " +
        s"the change batch — never a third over the folded history:\n$plan")
  }

  test("applyChanges plan: ranking window runs over the batch side only") {
    val base = (1L to 100L).map(i => ("t", i, s"v$i")).toDF("tbl", "uid", "v")
      .select($"tbl", $"uid", map(lit("v"), $"v").as("img"))
    val changes = Seq(("t", 1L, "UPDATE", "x", 1L))
      .toDF("tbl", "uid", "operation", "v", "seq")
      .select($"tbl", $"uid", $"operation", map(lit("v"), $"v").as("after"), $"seq")
    val df = Apply.applyChanges(base, $"img", changes, $"after", $"seq",
      Seq("tbl", "uid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1,
      s"exactly one ranking window (over the change batch):\n$plan")
  }

  // ---- size-tiered closed-log compaction: write amplification,
  // off-hot-path cadence, as-of pruning of uncompacted versions ----

  test("closed-log compaction property: total rows written is O(M log M), not O(M^2/K^2)") {
    // M >> K^2 synthetic single-row closed versions arrive one at a
    // time, maintenance runs after every arrival (the worst — most
    // eager — cadence). The ledger counts every row every fold writes.
    // Size-tiered policy: each row folds at most once per tier -> total
    // <= M * (1 + ceil(log_K M)). The r7 oldest-K policy re-folded its
    // own output: simulated on this exact workload it writes 2852 rows
    // — ABOVE the 2*M*ceil(log_K M) = 2048 bound asserted here, so the
    // property genuinely separates the policies (new policy: 684).
    val M = 256; val K = 4
    val dir = Files.createTempDirectory("graft_tiered").toString
    val closed = new java.io.File(s"$dir/closed"); closed.mkdirs()
    Files.write(java.nio.file.Paths.get(dir, "_buckets"), "4".getBytes)
    // stage all M versions in ONE partitioned write, reveal one per step
    val stage = s"$dir/_all"
    spark.range(M).select(
        lit("k").as("id"),
        map(lit("v"), $"id".cast("string")).as("image"),
        $"id".as("valid_from"), ($"id" + 1).as("valid_to"),
        lit(false).as("is_current"), $"id".as("_v"))
      .repartition(1).write.partitionBy("_v").parquet(stage)
    MaterializedView.segmentRowsWritten.set(0L)
    for (i <- 0 until M) {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(stage, s"_v=$i"),
        java.nio.file.Paths.get(closed.toString, s"v$i"))
      MaterializedView.maintainClosed(spark, dir, Seq("id"), K)
    }
    val written = MaterializedView.segmentRowsWritten.get()
    val bound = 2L * M * math.ceil(math.log(M) / math.log(K)).toLong
    assert(written <= bound,
      s"size-tiered write amplification: $written rows written for $M " +
        s"batches must stay under 2*M*ceil(log_K M) = $bound (the " +
        s"oldest-K policy writes 2852 here)")
    // the log stays bounded: <= K uncompacted versions + K segments/tier
    val dirs = closedDirNames(dir)
    assert(dirs.size <= K + K * math.ceil(math.log(M) / math.log(K)).toInt,
      s"directory count bounded by K per tier: $dirs")
    // folds lost and duplicated nothing: all M rows, distinct versions
    val got = MaterializedView.currentState(spark, dir, Seq("id"))
      .select($"valid_from").collect().map(_.getLong(0)).toSet
    assert(got == (0L until M.toLong).toSet,
      s"every closed row survives the folds exactly once (${got.size}/$M)")
  }

  test("compaction cadence: off-schedule batches never fold; maintainClosed folds out-of-band") {
    val dir = Files.createTempDirectory("graft_cadence").toString
    val src = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(src))
    def startQuery(state: String, ckpt: String) = {
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, ckpt,
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 4, compactClosedAfter = 2, compactEveryBatches = 1000,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
    }
    val state = s"$dir/state"
    for (b <- 0 until 6) {
      (walJson(100 * b + 10, if (b == 0) "I" else "U", 1L, s"a$b") ++
       walJson(100 * b + 20, if (b == 0) "I" else "U", 2L, s"b$b"))
        .toDF("wal_start", "data").write.json(s"$src/b$b.json")
      val q = startQuery(state, s"$dir/ckpt"); q.processAllAvailable(); q.stop()
    }
    // 5 batches were fold-ELIGIBLE (>= 2 closed versions short of the
    // newest) but off the cadence: the delivery path never paid a fold —
    // batch wall-time is independent of fold eligibility
    val before = closedDirNames(state)
    assert(before.size == 6 && before.forall(_.startsWith("v")),
      s"off-schedule batches must not fold: $before")
    def canon() = MaterializedView.currentState(spark, state, Seq("id"))
      .select($"id", element_at($"image", "v"), $"valid_from", $"valid_to",
        $"is_current")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    val pre = canon()
    // the maintenance schedule folds the SAME rule out-of-band
    MaterializedView.maintainClosed(spark, state, Seq("id"),
      compactClosedAfter = 2)
    val after = closedDirNames(state)
    assert(after.exists(_.startsWith("s")) && after.size < before.size,
      s"maintainClosed folds the accumulated log: $after")
    assert(canon() == pre, "out-of-band folds are a pure rewrite")
  }

  test("scd2AsOf prunes uncompacted closed versions via their append-time meta") {
    val dir = Files.createTempDirectory("graft_asof_prune").toString
    val src = s"$dir/in"; val state = s"$dir/state"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // 6 batches, no folds (cadence off): 6 uncompacted closed versions,
    // batch b's closed rows have valid_from/valid_to ~ 100*b + ..
    for (b <- 0 until 6) {
      (walJson(100 * b + 10, if (b == 0) "I" else "U", 1L, s"a$b") ++
       walJson(100 * b + 20, if (b == 0) "I" else "U", 2L, s"b$b"))
        .toDF("wal_start", "data").write.json(s"$src/b$b.json")
      val raw = spark.readStream
        .schema("wal_start LONG, data STRING").json(s"$src/*.json")
      val q = MaterializedView.startScd2(spark,
        CdcStream.pipeline(spark, raw, "testdb"), state, s"$dir/ckpt",
        keyCols = Seq("id"),
        seq = graft.streaming.OrderedSink.lsnNumeric(col("lsn")),
        buckets = 4, compactClosedAfter = 2, compactEveryBatches = 1000,
        trigger = Trigger.ProcessingTime("50 milliseconds"))
      q.processAllAvailable(); q.stop()
    }
    // every closed version WITH ROWS carries its append-time meta (the
    // first batch is all inserts: zero closed rows, nothing to describe;
    // exact batch ids shift with the restarts' empty batches)
    val vdirs = closedDirNames(state).filter(_.startsWith("v"))
      .toSeq.sortBy(_.drop(1).toLong)
    assert(vdirs.size == 6, s"six versions: $vdirs")
    def meta(v: String): Option[(Long, Long)] = {
      val f = new java.io.File(s"$state/closed/$v/_meta.json")
      if (!f.isFile) None
      else {
        val re = """\{"min_valid_from":(-?\d+),"max_valid_to":(-?\d+)\}""".r
        new String(java.nio.file.Files.readAllBytes(f.toPath)).trim match {
          case re(a, b) => Some((a.toLong, b.toLong))
          case _        => fail(s"unreadable meta in $v")
        }
      }
    }
    assert(vdirs.tail.forall(v => meta(v).isDefined),
      "append-time meta on every closed version with rows")
    // t=150: batch b closes the versions batch b-1 opened, so exactly
    // ONE version dir's range covers t ([111,211)/[121,221)); one older
    // dir expired before t, the later ones open after t — all prune
    // driver-side. The first dir has no meta (and no rows): listed,
    // unprunable by rule, empty in the read.
    val t0 = 150L
    val expected = vdirs.filter(v => meta(v) match {
      case Some((mn, mx)) => mn <= t0 && mx > t0
      case None           => true
    }).toSet
    assert(expected.size == 2, s"one no-meta dir + one in-range dir: $expected")
    val (plain, segs) = MaterializedView.scd2AsOfInputs(state, t = t0)
    assert(segs.isEmpty)
    // open bucket versions are also named v<id> — keep only closed-log dirs
    val listedClosed = plain.filter(_.getParentFile.getName == "closed")
      .map(_.getName).toSet
    assert(listedClosed == expected,
      s"as-of lists only in-range closed versions: $listedClosed vs $expected")
    // and the pruned read is still the exact validity-interval answer
    val at150 = MaterializedView.scd2AsOf(spark, state, Seq("id"), t = 150L)
      .select($"id", element_at($"image", "v")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(at150 == Map("1" -> "a1", "2" -> "b1"), s"asOf 150: $at150")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, DedupIndex}

/** Incremental dedup over a materialized bucketed shingle index: the
  * growing-corpus path (build once, check each ingest batch, fold it in).
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def cleanup(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_sizes")
  }

  test("incremental near-dups against the index match the batch verify") {
    val name = "graft_test_shidx"
    cleanup(name)
    try {
      val corpus = Seq(
        (1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different content about spark query planning"),
        (3L, "another unrelated document mentioning benchmarks and joins"))
        .toDF("doc_id", "text")
      DedupIndex.build(spark, corpus, "doc_id", "text", name, buckets = 4)

      // batch 2: doc 10 near-dups doc 1 (one token changed), doc 11 is new
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy cat today"),
        (11L, "fresh material with no overlap whatsoever here at all"))
        .toDF("doc_id", "text")
      val hits = DedupIndex.incrementalNearDups(spark, batch, "doc_id", "text",
        name, threshold = 0.5)
      val rows = hits.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toList
      assert(rows.map(t => (t._1, t._2)) == List((10L, 1L)), s"got $rows")

      // the jaccard equals the batch-mode exact verify on the union corpus
      val union = corpus.union(batch)
      val sh = Dedup.shingles(union, "doc_id", "text")
      val expected = Dedup.verifyJaccard(sh,
          Seq((1L, 10L)).toDF("id_a", "id_b"))
        .select($"jaccard").as[Double].head()
      assert(math.abs(rows.head._4 - expected) < 1e-12,
        s"incremental ${rows.head._4} vs batch $expected")

      // folding the batch in makes future batches see doc 10
      DedupIndex.append(spark, batch, "doc_id", "text", name, buckets = 4)
      val again = DedupIndex.incrementalNearDups(spark,
        Seq((20L, "the quick brown fox jumps over the lazy cat today"))
          .toDF("doc_id", "text"),
        "doc_id", "text", name, threshold = 0.9)
      val hit2 = again.select($"old_id").as[Long].collect().toSet
      assert(hit2.contains(10L), s"appended doc visible, got $hit2")
    } finally cleanup(name)
  }

  test("the corpus side of the intersection join is the bucketed scan (no corpus exchange)") {
    val name = "graft_test_shidx2"
    cleanup(name)
    try {
      val corpus = (1L to 50L)
        .map(i => (i, s"document number $i talks about topic${i % 7} and topic${i % 11}"))
        .toDF("doc_id", "text")
      DedupIndex.build(spark, corpus, "doc_id", "text", name, buckets = 4)
      val batch = Seq((100L, "document number 3 talks about topic3 and topic3"))
        .toDF("doc_id", "text")
      val df = DedupIndex.incrementalNearDups(spark, batch, "doc_id", "text",
        name, threshold = 0.1)
      df.collect()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        "index scan must use the bucket layout:\n" + formatted.take(1500))
      // hot-shingle guard: df-cap drops everything at maxDf=1 on this corpus
      val capped = DedupIndex.incrementalNearDups(spark, batch, "doc_id",
        "text", name, threshold = 0.0, maxDf = 1)
      assert(capped.count() <= df.count())
    } finally cleanup(name)
  }

  private def runMaintenance(docs: org.apache.spark.sql.DataFrame,
      name: String, ckpt: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupIndex.startMaintenance(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", name, ckpt,
      buckets = 4)
    try {
      // three micro-batches, ~a third of the docs each
      val rows = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().toSeq
      rows.grouped(math.max(1, (rows.size + 2) / 3)).foreach { slice =>
        input.addData(slice: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
  }

  test("streaming maintenance builds the identical index; restart-replay leaves no duplicates") {
    val name = "graft_test_shidx3"
    cleanup(name)
    val docs = (1L to 30L)
      .map(i => (i, s"streaming document $i about topic${i % 5} and more"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_idx_stream")
    try {
      runMaintenance(docs, name, s"$work/ck1")
      // contents == the batch-built index (modulo the partition column)
      val batchSh = Dedup.shingles(docs, "doc_id", "text")
        .select($"id", $"shingle").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val streamSh = spark.table(name)
        .select($"id", $"shingle").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamSh == batchSh, "streamed index == batch shingle set")
      val sizes = spark.table(s"${name}_sizes")
        .groupBy($"id").agg(sum($"n").as("n"))
      assert(sizes.filter($"n" =!= 1L).count() >= 0) // shape sanity
      // a SECOND pass over the same input with a FRESH checkpoint replays
      // batch ids 0..2 — the per-partition drop+append must rewrite, not
      // double-append (the crash-replay path in catalog-partition form)
      runMaintenance(docs, name, s"$work/ck2")
      val replayed = spark.table(name)
        .select($"id", $"shingle").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(replayed == batchSh, "replay leaves identical contents")
      assert(spark.table(name).count() == batchSh.size,
        "no duplicate (id, shingle) rows after replay")
      // and the maintained table still serves the zero-corpus-exchange join
      val hits = DedupIndex.incrementalNearDups(spark,
        Seq((100L, "streaming document 3 about topic3 and more"))
          .toDF("doc_id", "text"),
        "doc_id", "text", name, threshold = 0.5)
      assert(hits.select($"old_id").as[Long].collect().toSet.contains(3L))
      val formatted = hits.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        "maintained index scan keeps the bucket layout")
    } finally { cleanup(name); () }
  }

  test("span index: batch build + incrementalSpans match repeatedSpans; " +
      "streaming changelog = batch-vs-earlier only; replay identical; " +
      "corpus side stays bucketed") {
    val name = "graft_test_spidx"
    def cleanupSpan(): Unit = Seq(name, s"${name}_spans").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val loc = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$tb"
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(loc))
    }
    cleanupSpan()
    val span = (1 to 12).map(i => s"s$i").mkString(" ")
    val doc1 = (1L, ((1 to 5).map(i => s"a$i") :+ span).mkString(" "))
    val doc2 = (2L, (((1 to 3).map(i => s"b$i") :+ span) :+ "b4").mkString(" "))
    val doc3 = (3L, (1 to 10).map(i => s"c$i").mkString(" "))
    val doc4 = (4L, (((1 to 2).map(i => s"d$i") :+ span)).mkString(" "))
    try {
      // batch form: index over doc1, probe doc2 — one keep-first row,
      // identical to what repeatedSpans reports over the union
      DedupIndex.buildSpanIndex(spark, Seq(doc1).toDF("doc_id", "text"),
        "doc_id", "text", name, minLen = 5, buckets = 4)
      val inc = DedupIndex.incrementalSpans(spark,
        Seq(doc2).toDF("doc_id", "text"), "doc_id", "text", name,
        minLen = 5)
      val incRows = inc.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(incRows == Set((1L, 2L, 5L, 3L, 12L)), s"$incRows")
      val batchRows = Dedup.repeatedSpans(
        Seq(doc1, doc2).toDF("doc_id", "text"), "doc_id", "text",
        minLen = 5).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      assert(incRows == batchRows, "incremental == from-scratch spans")
      // corpus side of the seed join reads the bucketed layout
      val formatted = inc.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        "index scan keeps the bucket layout")
      cleanupSpan()

      // streaming form: three batches; arrivals match EARLIER state only
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      def run(ckpt: String): Unit = {
        implicit val sctx = spark.sqlContext
        val input = MemoryStream[(Long, String)]
        val q = DedupIndex.startSpanMaintenance(spark,
          input.toDF().toDF("doc_id", "text"), "doc_id", "text", name,
          ckpt, minLen = 5, buckets = 4)
        try Seq(Seq(doc1), Seq(doc2, doc3), Seq(doc4)).foreach { b =>
          input.addData(b: _*); q.processAllAvailable()
        } finally q.stop()
      }
      val work = java.nio.file.Files.createTempDirectory("graft_spidx")
      run(s"$work/ck1")
      val expected = Set((1L, 2L, 5L, 3L, 12L), (1L, 4L, 5L, 2L, 12L),
        (2L, 4L, 3L, 2L, 12L))
      def spansNow = spark.table(s"${name}_spans")
        .select($"id_a", $"id_b", $"a_start", $"b_start", $"n_tokens")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(spansNow.toSet == expected, s"changelog: $spansNow")
      assert(spansNow.size == 3, "no duplicate changelog rows")
      // fresh-checkpoint replay re-lands batches 0..2: the beforeBatch
      // guard keeps a replayed batch from matching its own already-landed
      // fingerprints, so contents are bit-identical (no self rows)
      run(s"$work/ck2")
      assert(spansNow.toSet == expected && spansNow.size == 3,
        s"replay identical: $spansNow")
    } finally { cleanupSpan(); () }
  }

  test("compact folds per-batch partitions into one; contents, bucketing, appends survive") {
    val name = "graft_test_shidx4"
    cleanup(name)
    spark.sql(s"DROP TABLE IF EXISTS ${name}_compacted")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_sizes_compacted")
    val docs = (1L to 24L)
      .map(i => (i, s"compaction document $i about topic${i % 4} here"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_idx_compact")
    try {
      runMaintenance(docs, name, s"$work/ck1")
      val before = spark.table(name)
        .select($"id", $"shingle").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(spark.table(name).select($"ingest_batch").distinct().count() == 3,
        "three micro-batches -> three partitions before compaction")
      DedupIndex.compact(spark, name, buckets = 4)
      // one folded partition, identical contents
      assert(spark.table(name).select($"ingest_batch").distinct()
        .as[Long].collect().toList == List(-1L))
      val after = spark.table(name)
        .select($"id", $"shingle").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(after == before, "compaction is a pure fold")
      // the rebuilt table still serves the zero-corpus-exchange join
      val hits = DedupIndex.incrementalNearDups(spark,
        Seq((100L, "compaction document 3 about topic3 here"))
          .toDF("doc_id", "text"),
        "doc_id", "text", name, threshold = 0.5)
      val formatted = hits.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("Bucketed: true"),
        "compacted index keeps the bucket layout")
      assert(hits.select($"old_id").as[Long].collect().contains(3L))
      // maintenance continues on the compacted table: a later batch
      // appends its own partition beside the folded one
      val more = Seq((200L, "a brand new compaction document about topic9"))
        .toDF("doc_id", "text")
      runMaintenance(more, name, s"$work/ck2")
      val parts = spark.table(name).select($"ingest_batch").distinct()
        .as[Long].collect().toSet
      assert(parts.contains(-1L) && parts.exists(_ >= 0L),
        s"folded + fresh partitions: $parts")
      assert(spark.table(name).filter($"id" === 200L).count() > 0)
    } finally {
      cleanup(name)
      spark.sql(s"DROP TABLE IF EXISTS ${name}_compacted")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_sizes_compacted")
      ()
    }
  }

  test("tiered compact: a later compaction never rewrites a prior fold; folded-batch replay skips") {
    val name = "graft_test_shidx5"
    cleanup(name)
    def fileState(part: Long): Set[(String, Long)] = {
      val loc = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath +
        s"/$name/ingest_batch=$part"
      Option(new java.io.File(loc).listFiles()).toSeq.flatten
        .filterNot(_.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toSet
    }
    def negatives = spark.table(name).select($"ingest_batch").distinct()
      .as[Long].collect().filter(_ < 0).toSet
    def allPairs = spark.table(name).select($"id", $"shingle")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val docsA = (1L to 12L)
      .map(i => (i, s"first era document $i about area${i % 3} right here"))
      .toDF("doc_id", "text")
    val docsB = (13L to 24L)
      .map(i => (i, s"second era document $i about area${i % 3} over there"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_idx_tier")
    try {
      runMaintenance(docsA, name, s"$work/ck1") // batch partitions 0,1,2
      DedupIndex.compact(spark, name, buckets = 4)
      assert(negatives == Set(-1L), s"first fold: $negatives")
      assert(DedupIndex.compactionHorizon(spark, name).contains(2L))
      val foldOne = fileState(-1L)
      assert(foldOne.nonEmpty)
      // a fresh checkpoint reuses ids 0..2 with DIFFERENT rows: the
      // fingerprint guard must land them (not mistake them for replays)
      runMaintenance(docsB, name, s"$work/ck2")
      assert(spark.table(name).filter($"id" === 24L).count() > 0,
        "fresh-era batches land despite ids at/below the horizon")
      val everything = allPairs
      // the Nth compaction folds ONLY the new batch partitions: the
      // prior fold's files are untouched (same names, same mtimes)
      DedupIndex.compact(spark, name, buckets = 4)
      assert(negatives == Set(-1L, -2L), s"second fold beside first: $negatives")
      assert(fileState(-1L) == foldOne,
        "a later compaction must not rewrite rows folded earlier")
      assert(allPairs == everything, "second fold is pure")
      // crash-replay of a folded batch: identical rows under a folded id
      // fingerprint-match the fold-time record and are SKIPPED
      val replaySlice = docsB.as[(Long, String)].collect().toSeq
        .grouped(4).toSeq.head // ck2's batch 0, exactly as runMaintenance sliced
      val replaySh = graft.ops.Dedup.shingles(
        replaySlice.toDF("doc_id", "text"), "doc_id", "text")
        .withColumn("ingest_batch", lit(0L))
      DedupIndex.landBatch(spark, spark, replaySh, name, 0L,
        bucketed = true, buckets = 4)
      assert(spark.table(name).select($"ingest_batch").distinct()
        .as[Long].collect().filter(_ >= 0).isEmpty,
        "replayed folded batch must not re-land")
      assert(allPairs == everything, "replay leaves contents untouched")
      // tier merge at fanout 2: the two span-3 tier-1 folds merge into
      // one strictly-higher-tier partition; contents still exact
      DedupIndex.compact(spark, name, buckets = 4, tierFanout = 2)
      assert(negatives == Set(-3L), s"tier merge: $negatives")
      assert(allPairs == everything, "tier merge is pure")
      // and the merged index still serves the zero-corpus-exchange join
      val hits = DedupIndex.incrementalNearDups(spark,
        Seq((100L, "second era document 20 about area2 over there"))
          .toDF("doc_id", "text"), "doc_id", "text", name, threshold = 0.8)
      assert(hits.select($"old_id").as[Long].collect().contains(20L))
    } finally { cleanup(name); () }
  }

  test("concurrent compact() and maintenance-side recovery execute a pending fold exactly once") {
    val name = "graft_test_shidx7"
    cleanup(name)
    val docs = (1L to 12L)
      .map(i => (i, s"race fold document $i about lane${i % 3} right here"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_idx_race")
    try {
      runMaintenance(docs, name, s"$work/ck1") // partitions 0,1,2
      val before = spark.table(name).select($"id", $"shingle").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val beforeCount = spark.table(name).count()
      assert(beforeCount == before.size.toLong, "no dups to start")
      // a crash-orphaned manifest BOTH threads will race to execute:
      // compact() directly, landBatch via its heal-pending-folds step.
      // Unserialized, both can run the same fold and double-append the
      // sources' rows into the dest partition.
      DedupIndex.writeManifest(spark, name, dest = -1L, span = 3L,
        horizon = 2L, sources = Seq(0L, 1L, 2L))
      val extra = Dedup.shingles(
        Seq((99L, "a concurrent landing batch occupying partition seven"))
          .toDF("doc_id", "text"), "doc_id", "text")
        .withColumn("ingest_batch", lit(7L))
      val extraCount = extra.count()
      val latch = new java.util.concurrent.CountDownLatch(2)
      val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
      def racer(body: => Unit) = new Thread(() => {
        latch.countDown(); latch.await()
        try body catch { case e: Throwable => errs.add(e); () }
      })
      val t1 = racer(DedupIndex.compact(spark, name, buckets = 4))
      val t2 = racer(DedupIndex.landBatch(spark, spark, extra, name, 7L,
        bucketed = true, buckets = 4))
      t1.start(); t2.start(); t1.join(120000); t2.join(120000)
      assert(errs.isEmpty, s"concurrent fold/land must not throw: $errs")
      spark.catalog.refreshTable(name)
      assert(DedupIndex.readManifest(spark, name).isEmpty,
        "the pending fold was consumed")
      val afterCount = spark.table(name).count()
      assert(afterCount == beforeCount + extraCount,
        s"the fold executed EXACTLY once: $beforeCount + $extraCount " +
          s"landed rows expected, got $afterCount (double-append inflates)")
      val afterSet = spark.table(name).select($"id", $"shingle").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(afterSet == before ++ afterSet.filter(_._1 == 99L),
        "contents = original shingles + the landed batch, nothing else")
    } finally { cleanup(name); () }
  }

  test("fold crash recovery: manifest-before-write redoes; manifest-after-partial-drops finishes") {
    val name = "graft_test_shidx6"
    cleanup(name)
    val docs = (1L to 12L)
      .map(i => (i, s"crash recovery document $i about zone${i % 3} here"))
      .toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("graft_idx_crash")
    try {
      runMaintenance(docs, name, s"$work/ck1") // partitions 0,1,2
      def allPairs = spark.table(name).select($"id", $"shingle")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      def parts = spark.table(name).select($"ingest_batch").distinct()
        .as[Long].collect().toSet
      val before = allPairs
      // --- crash arm 1: manifest written, fold NEVER ran (crash between
      // manifest create and the dest write). All sources still live, so
      // the next compact must REDO the fold from them.
      DedupIndex.writeManifest(spark, name, dest = -1L, span = 3L,
        horizon = 2L, sources = Seq(0L, 1L, 2L))
      assert(DedupIndex.readManifest(spark, name).isDefined)
      DedupIndex.compact(spark, name, buckets = 4)
      assert(DedupIndex.readManifest(spark, name).isEmpty,
        "recovery consumed the orphaned manifest")
      assert(parts == Set(-1L), s"fold completed by recovery: $parts")
      assert(allPairs == before, "recovered fold is pure")
      assert(DedupIndex.compactionHorizon(spark, name).contains(2L))
      // --- crash arm 2: fold + props complete, SOME sources dropped,
      // manifest still present (crash mid-drop). Since a source is gone,
      // recovery must NOT rewrite the fold — only finish the drops.
      runMaintenance(
        (13L to 20L).map(i => (i, s"crash recovery document $i about zone${i % 3} here"))
          .toDF("doc_id", "text"), name, s"$work/ck2")
      DedupIndex.compact(spark, name, buckets = 4) // folds era 2 -> -2
      val after2 = allPairs
      assert(parts == Set(-1L, -2L))
      // stage the crash: a manifest claiming -2 was folding sources
      // {0, 1} where 0 is ALREADY gone (simulates mid-drop crash; 1 is
      // aliased here by re-landing a partition to drop)
      DedupIndex.landBatch(spark, spark,
        Dedup.shingles(Seq((99L, "an extra doc to occupy a partition"))
          .toDF("doc_id", "text"), "doc_id", "text")
          .withColumn("ingest_batch", lit(7L)),
        name, 7L, bucketed = true, buckets = 4)
      val withExtra = allPairs
      assert(withExtra != after2 && parts == Set(-2L, -1L, 7L))
      DedupIndex.writeManifest(spark, name, dest = -2L, span = 2L,
        horizon = Long.MinValue, sources = Seq(0L, 7L)) // 0 is long gone
      DedupIndex.compact(spark, name, buckets = 4)
      assert(DedupIndex.readManifest(spark, name).isEmpty)
      assert(!parts.contains(7L),
        "recovery finished the pending drops without rewriting the fold")
      assert(allPairs == after2,
        "partition 7's rows left with the manifest's completed fold story")
    } finally { cleanup(name); () }
  }

  private def cleanupClusters(name: String): Unit = {
    cleanup(name)
    spark.sql(s"DROP TABLE IF EXISTS ${name}_clusters")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_changelog")
    spark.sql(s"DROP TABLE IF EXISTS ${name}_tombstones")
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath +
      s"/${name}_clusters__stage"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(loc))
  }

  // near-dup families: 1~2~3 (chain), 11~12, everything else singleton;
  // streamed as three batches that exercise attach, displace, and bridge
  private val clusterDocs = Seq(
    2L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    3L -> "alpha beta gamma delta epsilon zeta eta theta iota mu",
    12L -> "one two three four five six seven eight nine ten",
    20L -> "completely unrelated content about catalyst plan rewrites",
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    11L -> "one two three four five six seven eight nine ten",
    30L -> "another singleton document mentioning shuffles and sorts")
  private val clusterBatches = Seq(Seq(2L, 3L, 20L), Seq(1L, 12L), Seq(11L, 30L))
    .map(ids => clusterDocs.filter(d => ids.contains(d._1)))

  private def runClusterMaintenance(name: String, ckpt: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = DedupIndex.startClusterMaintenance(spark,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", name, ckpt,
      threshold = 0.8, buckets = 4)
    try clusterBatches.foreach { slice =>
      input.addData(slice: _*)
      q.processAllAvailable()
    } finally q.stop()
  }

  test("cluster maintenance: maintained labels ≡ from-scratch components; " +
      "changelog net effect ≡ final survivors; replay changes nothing") {
    val name = "graft_test_clidx"
    cleanupClusters(name)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("clidx_ck").toString
      runClusterMaintenance(name, ckpt)
      // 1. maintained table ≡ one-shot clustering of everything
      val all = clusterDocs.toDF("doc_id", "text")
      val pairs = graft.ops.Dedup.ngramJaccardPairs(
        graft.ops.Dedup.shingleIndex(all, "doc_id", "text"), 0.8,
        maxDf = 1000)
      val scratch = all.select($"doc_id".as("id"))
        .join(graft.ops.Dedup.components(pairs), Seq("id"), "left")
        .select($"id", coalesce($"cluster", $"id").as("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def maintained = spark.table(s"${name}_clusters")
        .select($"id", $"cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(maintained == scratch,
        s"incremental ≡ from-scratch: $maintained vs $scratch")
      // the chain 1~2~3 collapsed across batches (displacement: 1 lands
      // after 2, wins) and 11 displaced 12 — both retractions happened
      val log = spark.table(s"${name}_changelog")
        .select($"op", $"doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val net = log.collect { case ("add", id) => id }.toSet --
        log.collect { case ("retract", id) => id }.toSet
      val survivors = maintained.groupBy(_._2).map(_._2.map(_._1).min).toSet
      assert(net == survivors,
        s"changelog adds minus retracts ≡ final survivors: $net vs $survivors")
      assert(log.contains(("retract", 2L)) && log.contains(("retract", 12L)),
        s"displacements were announced: ${log.toSeq.sorted}")
      // 2. replaying the FINAL batch (foreachBatch at-least-once) is a
      // no-op: applied guard skips, index partitions re-land identically
      val before = (maintained,
        spark.table(s"${name}_changelog").count(),
        spark.table(name).count())
      DedupIndex.maintainClusters(spark, spark,
        clusterBatches.last.toDF("doc_id", "text"), "doc_id", "text",
        name, batchId = clusterBatches.size - 1L, threshold = 0.8,
        n = 3, buckets = 4)
      val after = (maintained,
        spark.table(s"${name}_changelog").count(),
        spark.table(name).count())
      assert(before == after, s"replay must be a no-op: $before vs $after")
    } finally { cleanupClusters(name); () }
  }

  test("takedown: removing a BRIDGE splits its cluster; removing a " +
      "survivor promotes the next; tombstoned docs never pair again") {
    val name = "graft_test_clidx3"
    cleanupClusters(name)
    try {
      // chain 1~2~3 where 2 is the ONLY bridge (1 !~ 3): 12-token texts,
      // one end token changed per hop keeps jaccard at 9/11 ≈ 0.82 per
      // edge and 8/12 ≈ 0.67 across the chain. Cluster 5~6, singleton 9.
      val base = (1 to 12).map(i => s"t$i")
      val docs = Seq(
        1L -> base.mkString(" "),
        2L -> (base.dropRight(1) :+ "x").mkString(" "),
        3L -> (("y" +: base.drop(1).dropRight(1)) :+ "x").mkString(" "),
        5L -> "uno dos tres cuatro cinco seis siete ocho nueve diez once doce",
        6L -> "uno dos tres cuatro cinco seis siete ocho nueve diez once trece",
        9L -> "unrelated singleton content about broadcast joins and sorts")
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sctx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val ckpt = java.nio.file.Files.createTempDirectory("clidx3_ck").toString
      val q = DedupIndex.startClusterMaintenance(spark,
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", name, ckpt,
        threshold = 0.8, buckets = 4)
      def clusters = spark.table(s"${name}_clusters")
        .select($"id", $"cluster")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      try {
        input.addData(docs: _*); q.processAllAvailable()
        assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
          5L -> 5L, 6L -> 5L, 9L -> 9L), s"pre-state: $clusters")
        // 1. remove the bridge: {1,2,3} SPLITS into {1} and {3}
        DedupIndex.retractDocs(spark, name, Seq(2L).toDF("id"),
          opId = 1000L, buckets = 4)
        assert(clusters == Map(1L -> 1L, 3L -> 3L,
          5L -> 5L, 6L -> 5L, 9L -> 9L), s"post-split: $clusters")
        // 2. remove a survivor: 6 takes over cluster {5,6}
        DedupIndex.retractDocs(spark, name, Seq(5L).toDF("id"),
          opId = 1001L, buckets = 4)
        assert(clusters == Map(1L -> 1L, 3L -> 3L, 6L -> 6L, 9L -> 9L),
          s"post-promotion: $clusters")
        val log = spark.table(s"${name}_changelog")
          .filter($"ingest_batch" >= 1000L)
          .select($"ingest_batch", $"op", $"doc_id")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          .toSet
        assert(log == Set((1000L, "add", 3L),          // split-off half
            (1001L, "retract", 5L), (1001L, "add", 6L)), // promotion
          s"takedown changelog: $log")
        // 3. idempotent replay of the same op: nothing changes
        val before = clusters
        DedupIndex.retractDocs(spark, name, Seq(5L).toDF("id"),
          opId = 1001L, buckets = 4)
        assert(clusters == before, "takedown replay is a no-op")
        // 4. retract the singleton 9, then ingest an EXACT COPY of its
        // text: were the tombstone ignored, the copy would join 9's
        // cluster — it must land as its own singleton instead
        DedupIndex.retractDocs(spark, name, Seq(9L).toDF("id"),
          opId = 1002L, buckets = 4)
        input.addData(20L -> docs.toMap.apply(9L))
        q.processAllAvailable()
        assert(clusters == Map(1L -> 1L, 3L -> 3L, 6L -> 6L, 20L -> 20L),
          s"tombstoned docs never pair again: $clusters")
      } finally q.stop()
    } finally { cleanupClusters(name); () }
  }

  test("cluster rewrite crash recovery: a pending marker re-executes the " +
      "staged bucket swap exactly once") {
    val name = "graft_test_clidx2"
    cleanupClusters(name)
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("clidx2_ck").toString
      runClusterMaintenance(name, ckpt)
      val cl = s"${name}_clusters"
      val healthy = spark.table(cl).select($"id", $"cluster", $"bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // forge the crash window: bucket b's new contents are staged and
      // the pending marker is set, but the partition was dropped and the
      // re-append never ran
      val b = spark.table(cl).select($"bucket").head().getLong(0)
      val stage = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/${cl}__stage"
      spark.table(cl).filter($"bucket" === b)
        .select($"id", $"cluster", $"bucket")
        .write.mode("overwrite").parquet(stage)
      val lastB = clusterBatches.size - 1L
      spark.sql(s"ALTER TABLE $cl SET TBLPROPERTIES " +
        s"('graft.cluster.pending'='$lastB:$b')")
      spark.sql(s"ALTER TABLE $cl DROP IF EXISTS PARTITION (bucket=$b)")
      spark.catalog.refreshTable(cl)
      assert(spark.table(cl).count() < healthy.size, "crash state is visible")
      // the next batch's entry path recovers, then applies (a replayed
      // final batch here — the guard skips the apply, recovery still runs)
      DedupIndex.maintainClusters(spark, spark,
        clusterBatches.last.toDF("doc_id", "text"), "doc_id", "text",
        name, batchId = lastB, threshold = 0.8, n = 3, buckets = 4)
      val recovered = spark.table(cl).select($"id", $"cluster", $"bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(recovered == healthy, "recovery restored the staged bucket")
      assert(!DedupIndex.clusterPending(spark, cl),
        "the pending marker is cleared")
    } finally { cleanupClusters(name); () }
  }
}

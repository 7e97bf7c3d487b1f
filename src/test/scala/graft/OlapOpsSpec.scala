package graft

import org.apache.spark.sql.functions._
import graft.ops.{Expectations, HistogramCube, Layout, SketchCube}

/** SketchCube / Layout / Expectations semantics: sketch-merge exactness
  * (shard-then-union ≡ whole-corpus), Morton tiling bounds, and the
  * one-pass audit's violation arithmetic.
  */
class OlapOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- SketchCube -------------------------------------------------------

  test("sketch cube: union of shard cubes equals the whole-corpus cube") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val dims = Seq("l_returnflag")
    val whole = SketchCube.estimate(
        SketchCube.build(li, dims, "l_orderkey"))
      .select($"l_returnflag", $"n_rows", $"distinct_est")
      .orderBy($"l_returnflag").collect().toList
    // shard on an arbitrary row attribute — shards sketch independently,
    // then merge; HLL register union makes the result EXACTLY the
    // whole-corpus sketch, the no-rescan landing contract.
    val s1 = SketchCube.build(li.filter($"l_orderkey" % 2 === 0), dims, "l_orderkey")
    val s2 = SketchCube.build(li.filter($"l_orderkey" % 2 === 1), dims, "l_orderkey")
    val merged = SketchCube.estimate(SketchCube.merge(s1, s2, dims))
      .select($"l_returnflag", $"n_rows", $"distinct_est")
      .orderBy($"l_returnflag").collect().toList
    assert(merged.map(_.toSeq) == whole.map(_.toSeq))
  }

  test("sketch cube: estimates sit inside the 5% contract band vs exact") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val cube = SketchCube.build(li, Seq("l_returnflag", "l_linestatus"), "l_orderkey")
    val est = SketchCube.estimate(SketchCube.rollup(cube, Seq("l_returnflag")))
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact"))
    val off = est.join(exact, "l_returnflag")
      .filter(abs($"distinct_est" - $"exact").cast("double") > lit(0.05) * $"exact")
      .count()
    assert(off == 0L)
  }

  test("sketch cube: rollup to the grand total touches only the cube") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val cube = SketchCube.build(li, Seq("l_returnflag", "l_linestatus"), "l_orderkey")
    val total = SketchCube.estimate(SketchCube.rollup(cube, Nil)).collect()(0)
    val exactTotal = li.select(countDistinct($"l_orderkey")).as[Long].head()
    assert(math.abs(total.getAs[Long]("distinct_est") - exactTotal).toDouble
      <= 0.05 * exactTotal)
    assert(total.getAs[Long]("n_rows") == li.count())
  }

  test("maintained sketch cube: land, compact, serve equals inline build") {
    val name = "graft_test_cube_m"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath + s"/$name"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(loc))
    val dims = Seq("l_returnflag", "l_linestatus")
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select($"l_orderkey", $"l_returnflag", $"l_linestatus")
    try {
      // land three batches through the idempotent protocol (batch form of
      // the maintenance stream's foreachBatch body)
      Seq(0L, 1L, 2L).foreach { b =>
        val part = li.filter(pmod($"l_orderkey", lit(3L)) === b)
        val cube = SketchCube.build(part, dims, "l_orderkey")
          .withColumn("ingest_batch", lit(b))
        graft.ops.DedupIndex.landBatch(spark, spark, cube, name, b,
          bucketed = false, buckets = 8)
      }
      val inline = SketchCube.estimate(
          SketchCube.rollup(SketchCube.build(li, dims, "l_orderkey"),
            Seq("l_returnflag")))
        .select($"l_returnflag", $"n_rows", $"distinct_est")
        .orderBy($"l_returnflag").collect().map(_.toSeq).toList
      val served = SketchCube.serve(spark, name, Seq("l_returnflag"))
        .select($"l_returnflag", $"n_rows", $"distinct_est")
        .orderBy($"l_returnflag").collect().map(_.toSeq).toList
      assert(served == inline)
      // compact: folds merge per-batch partials via the cube rollup —
      // the table compresses to <= #slices rows, all in negative folds,
      // and serve is unchanged bit-for-bit
      SketchCube.compactMaintained(spark, name, dims)
      val slices = SketchCube.build(li, dims, "l_orderkey").count()
      assert(spark.table(name).count() <= slices)
      val parts = spark.sql(s"SHOW PARTITIONS $name").collect()
        .map(_.getString(0).split("=")(1).toLong)
      assert(parts.forall(_ < 0L), parts.mkString(","))
      val servedAfter = SketchCube.serve(spark, name, Seq("l_returnflag"))
        .select($"l_returnflag", $"n_rows", $"distinct_est")
        .orderBy($"l_returnflag").collect().map(_.toSeq).toList
      assert(servedAfter == inline)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  // --- HistogramCube ----------------------------------------------------

  test("histogram cube: shard-merged cube is bit-identical to whole-corpus") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet").select(
      $"o_orderpriority".as("prio"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"), $"o_orderkey")
    val whole = HistogramCube.build(o, Seq("prio"), $"cents", 100000L)
      .orderBy($"prio", $"bucket").collect().map(_.toSeq).toList
    val s1 = HistogramCube.build(o.filter($"o_orderkey" % 2 === 0),
      Seq("prio"), $"cents", 100000L)
    val s2 = HistogramCube.build(o.filter($"o_orderkey" % 2 === 1),
      Seq("prio"), $"cents", 100000L)
    val merged = HistogramCube.merge(s1, s2, Seq("prio"))
      .orderBy($"prio", $"bucket").collect().map(_.toSeq).toList
    assert(merged == whole)
  }

  test("histogram cube: quantile estimates within one bucket of exact") {
    val w = 100000L
    val o = spark.read.parquet(s"$sf0001/orders.parquet").select(
      $"o_orderpriority".as("prio"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
    val cube = HistogramCube.build(o, Seq("prio"), $"cents", w)
    val est = HistogramCube.quantiles(cube, Seq("prio"), w, Seq(50, 95))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact ceil-rank percentiles, same definition
    val exact = o.collect().groupBy(_.getString(0)).flatMap { case (p, rows) =>
      val sorted = rows.map(_.getLong(1)).sorted
      Seq(50, 95).map { q =>
        val rk = math.max(1, (sorted.length * q + 99) / 100)
        (p, q.toLong) -> sorted(rk - 1)
      }
    }
    exact.foreach { case (k, ex) =>
      val e = est(k)
      assert(math.abs(e - ex) <= w, s"$k est=$e exact=$ex")
    }
  }

  test("histogram cube: randomized quantile error stays within one bucket") {
    val rnd = new scala.util.Random(5)
    (1 to 3).foreach { round =>
      val w = Seq(10L, 250L, 1000L)(round - 1)
      val vals = Seq.fill(400)(rnd.nextInt(100000).toLong)
      val cube = HistogramCube.build(vals.map(("k", _)).toDF("k", "v"),
        Seq("k"), $"v", w)
      val est = HistogramCube.quantiles(cube, Seq("k"), w,
          Seq(1, 25, 50, 75, 99))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val sorted = vals.sorted
      Seq(1, 25, 50, 75, 99).foreach { q =>
        val rk = math.max(1, (sorted.length * q + 99) / 100)
        val exact = sorted(rk - 1)
        assert(math.abs(est(q.toLong) - exact) <= w,
          s"round $round w=$w q=$q est=${est(q.toLong)} exact=$exact")
      }
    }
  }

  test("histogram cube: quantiles read only the cube (no fact rescan)") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet").select(
      $"o_orderpriority".as("prio"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
    val cube = HistogramCube.build(o, Seq("prio"), $"cents", 100000L)
      .cache()
    cube.count()
    val q = HistogramCube.quantiles(cube, Seq("prio"), 100000L, Seq(99))
    // plan scans the cached cube, not the orders parquet
    // (the InMemoryRelation node embeds its recorded BUILD plan — only the
    // part above it is what this query executes)
    val plan = q.queryExecution.executedPlan.toString
    val live = plan.split("InMemoryRelation")(0)
    assert(live.contains("InMemoryTableScan") && !live.contains("FileScan"),
      live)
    cube.unpersist()
  }

  // --- Layout -----------------------------------------------------------

  test("zvalue2 matches the reference Morton interleave") {
    def mortonRef(x: Int, y: Int): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(64)((rnd.nextInt(65536), rnd.nextInt(65536))) ++
      Seq((0, 0), (65535, 65535), (1, 0), (0, 1), (65535, 0), (0, 65535))
    val got = pts.toDF("x", "y")
      .select($"x", $"y",
        Layout.zvalue2($"x".cast("long"), $"y".cast("long")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getInt(0), r.getInt(1)),
        s"(${r.getInt(0)}, ${r.getInt(1)})")
    }
  }

  test("zvalue3 matches the reference 3-way interleave") {
    def morton3Ref(x: Int, y: Int, z: Int): Long = {
      var v = 0L
      for (i <- 0 until 10) {
        v |= ((x >> i) & 1L) << (3 * i)
        v |= ((y >> i) & 1L) << (3 * i + 1)
        v |= ((z >> i) & 1L) << (3 * i + 2)
      }
      v
    }
    val rnd = new scala.util.Random(9)
    val pts = Seq.fill(64)((rnd.nextInt(1024), rnd.nextInt(1024),
      rnd.nextInt(1024))) ++
      Seq((0, 0, 0), (1023, 1023, 1023), (1, 0, 0), (0, 1, 0), (0, 0, 1))
    val got = pts.toDF("x", "y", "z")
      .select($"x", $"y", $"z", Layout.zvalue3($"x".cast("long"),
        $"y".cast("long"), $"z".cast("long")).as("zv"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) == morton3Ref(r.getInt(0), r.getInt(1), r.getInt(2)),
        s"(${r.getInt(0)}, ${r.getInt(1)}, ${r.getInt(2)})")
    }
  }

  test("z-cells tile: every aligned cell is a 128x128 rectangle") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("xb", pmod($"o_custkey", lit(1024L)))
      .withColumn("yb", pmod(
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        lit(1024L)))
    val cells = o.withColumn("zv", Layout.zvalue2($"xb", $"yb"))
      .groupBy(shiftright($"zv", 14).as("zcell"))
      .agg(min($"xb").as("x0"), max($"xb").as("x1"),
        min($"yb").as("y0"), max($"yb").as("y1"))
      .collect()
    assert(cells.nonEmpty)
    cells.foreach { c =>
      val cell = c.getLong(0)
      val (x0, x1) = (c.getLong(1), c.getLong(2))
      val (y0, y1) = (c.getLong(3), c.getLong(4))
      assert(x1 - x0 < 128 && y1 - y0 < 128, s"cell $cell spans too far")
      // and the box is the cell's OWN aligned tile (top 3 bits of each dim)
      assert(x0 >> 7 == x1 >> 7 && y0 >> 7 == y1 >> 7, s"cell $cell crosses tiles")
    }
  }

  test("cluster() is one range exchange and preserves the rows") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("xb", pmod($"o_custkey", lit(1024L)))
      .withColumn("yb", pmod($"o_orderkey", lit(1024L)))
    val clustered = Layout.cluster(o, "xb", "yb", 8)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning")
      || plan.toLowerCase.contains("range"), plan.take(500))
    assert(clustered.count() == o.count())
    // the layout actually clusters: mean per-partition span on EACH dim is
    // well under the full 1024 range (an x-only sort would leave the mean
    // y-span at ~full range — no pruning on y)
    val boxes = Layout.boundingBoxes(clustered, "xb", "yb")
      .filter($"n_rows" > 0).collect()
    val meanXSpan = boxes.map(b =>
      b.getAs[Long]("x_max") - b.getAs[Long]("x_min")).sum.toDouble / boxes.length
    val meanYSpan = boxes.map(b =>
      b.getAs[Long]("y_max") - b.getAs[Long]("y_min")).sum.toDouble / boxes.length
    assert(meanXSpan < 768, s"meanXSpan=$meanXSpan")
    assert(meanYSpan < 768, s"meanYSpan=$meanYSpan")
  }

  test("z-order layout prunes at REAL parquet footers; x-sort can't on y") {
    // the actual file-skipping mechanism: write both layouts, read the
    // column min/max back from the parquet footers, and count the files
    // a predicate's range intersects — what any engine's scan consults
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("xb", pmod($"o_custkey", lit(1024L)))
      .withColumn("yb", pmod(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"),
        lit(1024L)))
      .select($"xb", $"yb", $"o_orderkey")
    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val xdir = java.nio.file.Files.createTempDirectory("xsort").toString
    Layout.cluster(o, "xb", "yb", 16).write.mode("overwrite").parquet(zdir)
    o.repartitionByRange(16, $"xb").sortWithinPartitions($"xb")
      .write.mode("overwrite").parquet(xdir)

    def fileStats(dir: String): Seq[Map[String, (Long, Long)]] = {
      val conf = spark.sessionState.newHadoopConf()
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val perCol = scala.collection.mutable.Map.empty[String, (Long, Long)]
            r.getFooter.getBlocks.forEach { b =>
              b.getColumns.forEach { c =>
                val name = c.getPath.toDotString
                if (name == "xb" || name == "yb") {
                  val st = c.getStatistics
                  val mn = st.genericGetMin.asInstanceOf[java.lang.Long].toLong
                  val mx = st.genericGetMax.asInstanceOf[java.lang.Long].toLong
                  val cur = perCol.getOrElse(name, (Long.MaxValue, Long.MinValue))
                  perCol(name) = (math.min(cur._1, mn), math.max(cur._2, mx))
                }
              }
            }
            perCol.toMap
          } finally r.close()
        }
    }
    def candidates(stats: Seq[Map[String, (Long, Long)]],
        pred: Map[String, (Long, Long)]): Int =
      stats.count(s => pred.forall { case (c, (lo, hi)) =>
        val (mn, mx) = s(c); mx >= lo && mn <= hi
      })

    val zStats = fileStats(zdir)
    val xStats = fileStats(xdir)
    assert(zStats.size >= 12 && xStats.size >= 12, "want many files")
    val box = Map("xb" -> (0L, 127L), "yb" -> (0L, 127L))
    val yOnly = Map("yb" -> (0L, 127L))
    // a 2-D box touches a couple of z-curve segments, not the corpus
    assert(candidates(zStats, box) <= 4,
      s"z-layout box candidates: ${candidates(zStats, box)}/${zStats.size}")
    // the x-sorted layout cannot prune a y predicate AT ALL...
    assert(candidates(xStats, yOnly) == xStats.size)
    // ...while the z-layout skips at least half the files on y alone
    assert(candidates(zStats, yOnly) * 2 <= zStats.size,
      s"z-layout y-only candidates: ${candidates(zStats, yOnly)}/${zStats.size}")
  }

  // --- Anomaly ----------------------------------------------------------

  test("madOutliers: exact median/MAD and spike flagging") {
    // series 10,10,10,12,12,14,100 -> med=12 (ceil-rank 4 of 7),
    // devs 2,2,2,0,0,2,88 -> mad=2, outliers (>3*2): only 100
    val s1 = Seq(10L, 10L, 10L, 12L, 12L, 14L, 100L).map(("a", _))
    // flat series: med=5, mad=0 -> ANY deviation flags (documented
    // degeneration): 5,5,5,6 -> 1 outlier
    val s2 = Seq(5L, 5L, 5L, 6L).map(("b", _))
    val out = graft.ops.Anomaly.madOutliers(
        (s1 ++ s2).toDF("k", "v"), Seq("k"), "v", 3)
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toList == List(
      ("a", 7L, 12L, 2L, 1L),
      ("b", 4L, 5L, 0L, 1L)))
  }

  test("madOutliers: mean-based z-score would miss what MAD catches") {
    // one huge spike inflates stddev enough that 3-sigma misses a second,
    // smaller anomaly; MAD flags both
    val vs = Seq.fill(20)(10L) ++ Seq(40L, 1000L)
    val out = graft.ops.Anomaly.madOutliers(
      vs.map(("m", _)).toDF("k", "v"), Seq("k"), "v", 3).collect()(0)
    assert(out.getAs[Long]("n_outliers") == 2L)
    val mean = vs.sum.toDouble / vs.size
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
    assert(vs.count(v => math.abs(v - mean) > 3 * sd) < 2,
      "3-sigma should have missed the 40 spike for this test to mean anything")
  }

  // --- Expectations -----------------------------------------------------

  test("audit counts violations exactly, NULL predicate = violation") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "ok"), (null, "ok"), (-5L, "bad"), (2L, "ok"))
      .toDF("k", "s")
    val out = Expectations.audit(df, Seq(
        Expectations.RowCheck("k_positive", $"k" > 0L),
        Expectations.RowCheck("s_domain", $"s".isin("ok"))),
      uniqueCols = Seq("k"))
      .orderBy($"check").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // k_positive: null -> violation, -5 -> violation = 2
    // s_domain: one 'bad' = 1; unique_k: 5 rows, 4 distinct (null counts
    // as a distinct group dropped by countDistinct -> 3 non-null distinct
    // + nulls excluded => violations = 5 - 3 = 2
    assert(out.toList == List(
      ("k_positive", 5L, 2L, false),
      ("s_domain", 5L, 1L, false),
      ("unique_k", 5L, 2L, false)))
  }

  test("fkAudit: orphans and null child keys, parent broadcast") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (99L, "orphan"), (null, "nullkey"))
      .toDF("fk", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val audit = Expectations.fkAudit(child, "fk", parent, "pk", "fk_check")
    val plan = audit.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(800))
    val r = audit.collect()(0)
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)) ==
      ("fk_check", 4L, 2L, false))
    // allowNull mode: the null child key is not an orphan
    val r2 = Expectations.fkAudit(child, "fk", parent, "pk", "fk_check",
      allowNull = true).collect()(0)
    assert(r2.getLong(2) == 1L && !r2.getBoolean(3))
  }

  test("audit of a clean table passes every check") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val out = Expectations.audit(o, Seq(
        Expectations.RowCheck("status_domain",
          $"o_orderstatus".isin("F", "O", "P"))),
      uniqueCols = Seq("o_orderkey")).collect()
    assert(out.forall(_.getBoolean(3)))
  }
}

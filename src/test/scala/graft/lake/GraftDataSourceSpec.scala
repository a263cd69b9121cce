package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** `format("graft")` (DSv2 TableProvider + V1Scan fallback): snapshot
  * fidelity vs the native readers, time travel options, column pruning,
  * exact filter re-application, and the stats tier's FILE skipping
  * reached from pushed filters.
  */
class GraftDataSourceSpec extends SparkSpec {

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-dsv2").toString

  /** Four single-file commits with disjoint id ranges and id stats. */
  private def clusteredTable(): String = {
    val root = tmpRoot()
    (0 until 4).foreach { c =>
      TxLog.append(spark,
        (0 until 10).map(i => (c * 10L + i, s"s$c-$i")).toDF("id", "s")
          .repartition(1), root, statsCols = Seq("id"))
    }
    root
  }

  test("load(root) returns the same snapshot as readLatest; versionAsOf time-travels") {
    val root = clusteredTable()
    val viaFormat = spark.read.format("graft").load(root)
    viaFormat.schema shouldBe TxLog.readLatest(spark, root).schema
    viaFormat.orderBy("id").collect() shouldBe
      TxLog.readLatest(spark, root).orderBy("id").collect()
    spark.read.format("graft").option("versionAsOf", "1").load(root)
      .count() shouldBe 20L
    // count(*): empty required projection through the V1 fallback
    viaFormat.count() shouldBe 40L
  }

  test("pushed numeric bounds prune FILES through committed stats, rows stay exact") {
    val root = clusteredTable()
    TxLog.lastStatsPrune = None
    val out = spark.read.format("graft").load(root)
      .filter(col("id") >= 21L && col("id") < 25L)
      .select("id").as[Long].collect().sorted
    out shouldBe (21L to 24L)
    // one of four files survived the stats tier (file list pruned BEFORE
    // the scan existed — observed through the seam)
    TxLog.lastStatsPrune shouldBe Some((1, 4))
    // strictness is preserved: the widened skipping bound did not leak
    // id = 25 in, and the exact filters reach the inner scan
    val plan = spark.read.format("graft").load(root)
      .filter(col("id") >= 21L && col("id") < 25L)
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("GreaterThanOrEqual(id,21)")
  }

  test("pushed equality on a bloom-indexed key prunes FILES, parity with the native reader") {
    val root = tmpRoot()
    // eight single-file commits keyed by a STRING column — invisible to
    // the stats tier (bounds live in double space), exactly the lookup
    // shape the bloom index exists for
    (0 until 8).foreach { c =>
      TxLog.append(spark,
        (0 until 20).map(i => (s"k-$c-$i", c * 20L + i)).toDF("k", "v")
          .repartition(1), root)
    }
    TxLog.buildBloomIndex(spark, root, "k", expectedKeysPerFile = 1000L)
    TxLog.lastBloomPrune = None
    val out = spark.read.format("graft").load(root)
      .filter(col("k") === "k-5-7")
      .select("v").as[Long].collect().toSeq
    out shouldBe Seq(107L)
    // the bloom tier ran and scanned (far) fewer than the 8 live files;
    // parity with what the native point-lookup path would scan
    val Some((kept, total)) = TxLog.lastBloomPrune
    total shouldBe 8
    kept should be < 8
    kept shouldBe TxLog.bloomScanFileCount(spark, root, "k", Seq("k-5-7"))
    // IN probes prune to the union of matching buckets and lose nothing
    TxLog.lastBloomPrune = None
    spark.read.format("graft").load(root)
      .filter(col("k").isin("k-1-3", "k-6-19"))
      .select("v").as[Long].collect().sorted shouldBe Seq(23L, 139L)
    TxLog.lastBloomPrune.get._1 should be < 8
    // an unindexed column's equality still answers exactly (no pruning)
    spark.read.format("graft").load(root)
      .filter(col("v") === 107L).select("k").as[String].collect()
      .toSeq shouldBe Seq("k-5-7")
  }

  test("filters the source cannot apply exactly stay residual and still filter") {
    val root = clusteredTable()
    // EqualTo on a computed value Spark won't push; plus a translatable one
    val out = spark.read.format("graft").load(root)
      .filter(col("s").endsWith("-3") && col("id") < 20L)
      .select("id").as[Long].collect().sorted
    out shouldBe Seq(3L, 13L)
  }

  test("a renamed-column (mapped) table reads logical names through format(\"graft\")") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 5L).map(k => (k, s"p$k")).toDF("id", "payload")
        .repartition(1), root, statsCols = Seq("id"))
    TxLog.renameColumn(spark, root, "payload", "body")
    val df = spark.read.format("graft").load(root)
    df.columns.toSeq shouldBe Seq("id", "body")
    df.orderBy("id").select("body").as[String].collect()
      .head shouldBe "p1"
    // the mapping survives the filter/pruning path too
    df.filter(col("id") === 2L).select("body").as[String].collect()
      .toSeq shouldBe Seq("p2")
  }

  test("a held DataFrame is PINNED to its analysis-time snapshot") {
    val root = tmpRoot()
    TxLog.append(spark, (1L to 4L).map(k => (k, s"s$k")).toDF("id", "s"), root)
    val held = spark.read.format("graft").load(root)
    // concurrent full replacement, different schema shape entirely
    TxLog.overwrite(spark,
      Seq((9L, 1.5)).toDF("id", "weight"), root)
    // the held plan still reads the version it was analyzed against —
    // re-resolving LATEST here would emit rows mismatching the analyzed
    // schema (silent mis-typed reads under needConversion=false)
    held.count() shouldBe 4L
    held.orderBy("id").select("s").as[String].collect()
      .head shouldBe "s1"
    // a fresh read follows the new table
    val fresh = spark.read.format("graft").load(root)
    fresh.columns.toSeq shouldBe Seq("id", "weight")
    fresh.count() shouldBe 1L
  }

  test("readStream.format(\"graft\") is the change feed (delegated source)") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    TxLog.append(spark, Seq((3L, "c")).toDF("id", "s"), root)
    val q = spark.readStream.format("graft").load(root)
      .filter(col("_change_type") === "insert")
      .select("id", "s")
      .writeStream.format("memory").queryName("g_feed")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000) shouldBe true
    spark.table("g_feed").orderBy("id").as[(Long, String)].collect()
      .toSeq shouldBe Seq((1L, "a"), (2L, "b"), (3L, "c"))
  }

  test("a declared schema with a mismatched type is refused at analysis") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 5L).map(k => (k, s"s$k")).toDF("id", "s"), root)
    // INT for a BIGINT column: under needConversion=false this would
    // reinterpret unsafe-row bytes — must refuse, not return garbage
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft").schema("id INT, s STRING").load(root)
        .collect()
    }
    e.getMessage should include("lossless upcast")
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft").schema("nope STRING").load(root).collect()
    }
    e2.getMessage should include("does not exist")
  }

  test("a declared LOSSLESS upcast is honored (INT table read as BIGINT)") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1 to 5).map(k => (k, s"s$k")).toDF("id", "s"), root) // id: INT
    val df = spark.read.format("graft").schema("id BIGINT, s STRING")
      .load(root)
    df.schema("id").dataType shouldBe
      org.apache.spark.sql.types.LongType
    df.orderBy("id").select("id").as[Long].collect().toSeq shouldBe
      (1L to 5L)
  }

  test("a NaN comparison value contributes NO skipping bound") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1 to 8).map(k => (k.toLong, k.toDouble)).toDF("id", "d")
        .repartition(1), root, statsCols = Seq("d"))
    TxLog.lastStatsPrune = None
    // NaN sorts LARGEST in Spark's total order, so every non-NaN row
    // matches <= NaN — a NaN skipping bound would have pruned every
    // stats-bearing file and silently returned empty
    spark.read.format("graft").load(root)
      .filter(col("d") <= Double.NaN).count() shouldBe 8L
    TxLog.lastStatsPrune shouldBe None
  }

  test("the analysis-time pin survives a log truncated to its checkpoint") {
    val root = tmpRoot()
    (0 until 3).foreach { c =>
      TxLog.append(spark,
        (0 until 5).map(i => (c * 5L + i, s"s$i")).toDF("id", "s"), root)
    }
    TxLog.checkpoint(spark, root) shouldBe Some(2L)
    // hand-truncate EVERY raw entry (stronger than vacuumLog, which
    // keeps the horizon entry): reads must resolve via the checkpoint
    // and the pin must come from checkpoint-aware resolution — raw
    // replay sees nothing here and would silently drop the pin
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_txlog")).toSeq
      .filter(_.getPath.getName.matches("\\d{20}\\.json"))
      .foreach(st => fs.delete(st.getPath, false))
    val held = spark.read.format("graft").load(root)
    TxLog.overwrite(spark, Seq((99L, 1.5)).toDF("id", "weight"), root)
    // still the analyzed snapshot, not the overwrite's schema/rows
    held.count() shouldBe 15L
    held.orderBy("id").select("s").as[String].collect().head shouldBe "s0"
    spark.read.format("graft").load(root).columns.toSeq shouldBe
      Seq("id", "weight")
  }

  test("df.write.format(\"graft\"): all four SaveModes, partitionBy and statsCols flow through") {
    val root = tmpRoot() + "/t"
    val df1 = (0 until 12).map(i => (i.toLong, i % 2, s"s$i")).toDF("id", "p", "s")
    // default mode (ErrorIfExists) on a fresh root creates the table
    df1.write.format("graft").partitionBy("p").option("statsCols", "id")
      .save(root)
    TxLog.latestVersion(spark, root) shouldBe Some(0L)
    // both read surfaces agree
    spark.read.format("graft").load(root).orderBy("id").collect() shouldBe
      TxLog.readLatest(spark, root).orderBy("id").collect()
    // partitionBy reached the layout (hive-style partition dirs)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(s"$root/p=1")) shouldBe true
    // statsCols reached the commit: a pushed bound prunes files
    df1.withColumn("id", col("id") + 12L).write.format("graft")
      .mode("append").partitionBy("p").option("statsCols", "id").save(root)
    TxLog.lastStatsPrune = None
    spark.read.format("graft").load(root).filter(col("id") >= 15L)
      .count() shouldBe 9L
    val Some((kept, total)) = TxLog.lastStatsPrune
    kept should be < total
    // Ignore on existing state is a no-op
    Seq((99L, 0, "x")).toDF("id", "p", "s").write.format("graft")
      .mode("ignore").save(root)
    TxLog.readLatest(spark, root).count() shouldBe 24L
    // ErrorIfExists on existing state refuses
    val e = intercept[Exception] {
      df1.write.format("graft").mode("error").save(root)
    }
    e.getMessage should include("already has committed state")
    // Overwrite replaces content AND schema, one commit
    Seq((7L, 1.5)).toDF("id", "w").write.format("graft")
      .mode("overwrite").save(root)
    val after = spark.read.format("graft").load(root)
    after.columns.toSeq shouldBe Seq("id", "w")
    after.count() shouldBe 1L
  }

  test("batch append with txnAppId+txnVersion is exactly-once across replays") {
    val root = tmpRoot() + "/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    def write(v: Long): Unit =
      df.write.format("graft").mode("append")
        .option("txnAppId", "job1").option("txnVersion", v.toString)
        .save(root)
    write(1L); write(1L) // the replay is skipped by the table watermark
    TxLog.latestVersion(spark, root) shouldBe Some(0L)
    TxLog.readLatest(spark, root).count() shouldBe 2L
    write(2L) // a genuinely new txn version commits
    TxLog.readLatest(spark, root).count() shouldBe 4L
    // half an identity is refused, not guessed
    val e = intercept[Exception] {
      df.write.format("graft").mode("append")
        .option("txnAppId", "job1").save(root)
    }
    e.getMessage should include("set both or neither")
  }

  test("an evolution append through format(\"graft\") reaches TxLog's schema policy") {
    val root = tmpRoot() + "/t"
    Seq((1L, "a")).toDF("id", "s").write.format("graft").save(root)
    // new column: the connector must not pre-refuse with READ validation
    // rules — TxLog.append's own evolution policy decides
    Seq((2L, "b", 0.5)).toDF("id", "s", "w").write.format("graft")
      .mode("append").save(root)
    val out = spark.read.format("graft").load(root)
    out.columns.toSeq shouldBe Seq("id", "s", "w")
    out.orderBy("id").select("w").collect().map(_.isNullAt(0))
      .toSeq shouldBe Seq(true, false)
  }

  test("writeStream.format(\"graft\") drains through the exactly-once sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpRoot() + "/t"
    val ckpt = Files.createTempDirectory("graft-dsv2-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "s").writeStream
      .format("graft")
      .option("checkpointLocation", ckpt)
      .start(root)
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    // one table version per micro-batch, exactly-once identity from the
    // checkpoint location — the txlog sink's contract, on the short name
    TxLog.latestVersion(spark, root) shouldBe Some(1L)
    spark.read.format("graft").load(root).orderBy("id")
      .select("s").as[String].collect().toSeq shouldBe Seq("a", "b", "c")
  }

  test("CREATE TABLE ... USING graft reaches the snapshot through the session catalog") {
    val root = clusteredTable()
    spark.sql("DROP TABLE IF EXISTS g_ddl")
    spark.sql(s"CREATE TABLE g_ddl USING graft OPTIONS (path '$root')")
    try {
      spark.table("g_ddl").count() shouldBe 40L
      spark.sql("SELECT count(*) FROM g_ddl WHERE id < 10")
        .head().getLong(0) shouldBe 10L
    } finally spark.sql("DROP TABLE g_ddl")
  }

  // ---- metadata-only aggregate pushdown -----------------------------

  private def isLocalPlan(df: org.apache.spark.sql.DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    val hasLocal = plan.collectWithSubqueries {
      case l: org.apache.spark.sql.execution.LocalTableScanExec => l
    }.nonEmpty
    val opensFiles = plan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case r: org.apache.spark.sql.execution.RowDataSourceScanExec => r
    }.nonEmpty
    hasLocal && !opensFiles
  }

  test("COUNT(*)/MIN/MAX are answered from commit metadata: LocalTableScan, zero data files") {
    val root = clusteredTable() // statsCols = id on every commit
    GraftDataSource.lastAggPushdown = None
    val df = spark.read.format("graft").load(root)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    isLocalPlan(df) shouldBe true
    df.head() shouldBe org.apache.spark.sql.Row(40L, 0L, 39L)
    GraftDataSource.lastAggPushdown shouldBe
      Some("COUNT(*), MIN(id), MAX(id)")
    // same through SQL over the catalog surface
    spark.sql("DROP TABLE IF EXISTS g_agg")
    spark.sql(s"CREATE TABLE g_agg USING graft OPTIONS (path '$root')")
    try {
      val viaSql =
        spark.sql("SELECT COUNT(*) AS n, MIN(id) AS mn, MAX(id) AS mx FROM g_agg")
      isLocalPlan(viaSql) shouldBe true
      viaSql.head() shouldBe org.apache.spark.sql.Row(40L, 0L, 39L)
    } finally spark.sql("DROP TABLE g_agg")
  }

  test("partition tier: GROUP BY partition columns and partition-equality COUNTs answer from metadata") {
    val root = tmpRoot()
    TxLog.append(spark,
      (0L until 40L).map(i => (i, s"p${i % 4}")).toDF("id", "part"),
      root, partitionCols = Seq("part"), statsCols = Seq("id"))
    TxLog.append(spark, Seq((100L, "p0")).toDF("id", "part"), root,
      partitionCols = Seq("part"), statsCols = Seq("id"))
    TxLog.deleteVectored(spark, root, col("id") === 0L) // dv-subtracted
    val t = spark.read.format("graft").load(root)
    // GROUP BY partition column: one LocalTableScan row per partition
    GraftDataSource.lastAggPushdown = None
    val grouped = t.groupBy("part").agg(count(lit(1)).as("n"))
    isLocalPlan(grouped) shouldBe true
    grouped.orderBy("part").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("p0", 10L), ("p1", 10L), ("p2", 10L), ("p3", 10L))
    GraftDataSource.lastAggPushdown.get should include("GROUP BY part")
    // partition-equality filter absorbed into a metadata COUNT
    GraftDataSource.lastAggPushdown = None
    val filtered = t.filter(col("part") === "p1").agg(count(lit(1)).as("n"))
    isLocalPlan(filtered) shouldBe true
    filtered.head().getLong(0) shouldBe 10L
    GraftDataSource.lastAggPushdown.get should include("partition metadata")
    // filter + GROUP BY compose; a no-match filter yields zero groups
    val both = t.filter(col("part") === "p2").groupBy("part")
      .agg(count(lit(1)).as("n"))
    isLocalPlan(both) shouldBe true
    both.collect().map(r => (r.getString(0), r.getLong(1))).toSeq shouldBe
      Seq(("p2", 10L))
    val none = t.filter(col("part") === "nope").groupBy("part")
      .agg(count(lit(1)).as("n"))
    isLocalPlan(none) shouldBe true
    none.count() shouldBe 0L
    // ...and an UNGROUPED count over a no-match filter is one zero row
    val zero = t.filter(col("part") === "nope").agg(count(lit(1)).as("n"))
    isLocalPlan(zero) shouldBe true
    zero.head().getLong(0) shouldBe 0L
    // declines (falls back to a correct scan): non-partition group key,
    // non-equality partition predicate, non-COUNT aggregate
    GraftDataSource.lastAggPushdown = None
    val byId = t.groupBy("id").agg(count(lit(1)).as("n"))
    isLocalPlan(byId) shouldBe false
    byId.count() shouldBe 40L
    val gt = t.filter(col("part") > "p1").agg(count(lit(1)).as("n"))
    isLocalPlan(gt) shouldBe false
    gt.head().getLong(0) shouldBe 20L
    GraftDataSource.lastAggPushdown shouldBe None
    // the vector's file holds p0's MIN: no clean file dominates it, so
    // MIN declines to the scan (which sees the deletion: 0 is gone)...
    val mn = t.groupBy("part").agg(min("id").as("mn"))
    isLocalPlan(mn) shouldBe false
    mn.orderBy("part").collect().map(_.getLong(1)).toSeq shouldBe
      Seq(4L, 1L, 2L, 3L)
    // ...while MAX stays metadata-answered: p0's max lives in the
    // clean second-append file, which dominates the dirty file's stats
    val mx = t.groupBy("part").agg(max("id").as("mx"))
    isLocalPlan(mx) shouldBe true
    mx.orderBy("part").collect().map(_.getLong(1)).toSeq shouldBe
      Seq(100L, 37L, 38L, 39L)
  }

  test("partition tier: per-partition MIN/MAX answer from grouped file stats; vectors decline bounds, not counts") {
    val root = tmpRoot()
    TxLog.append(spark,
      (0L until 40L).map(i => (i, s"p${i % 4}")).toDF("id", "part"),
      root, partitionCols = Seq("part"), statsCols = Seq("id"))
    TxLog.append(spark, Seq((100L, "p0")).toDF("id", "part"), root,
      partitionCols = Seq("part"), statsCols = Seq("id"))
    val t = spark.read.format("graft").load(root)
    GraftDataSource.lastAggPushdown = None
    val g = t.groupBy("part").agg(count(lit(1)).as("n"),
      min("id").as("mn"), max("id").as("mx"))
    isLocalPlan(g) shouldBe true
    g.orderBy("part").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe Seq(("p0", 11L, 0L, 100L), ("p1", 10L, 1L, 37L),
        ("p2", 10L, 2L, 38L), ("p3", 10L, 3L, 39L))
    GraftDataSource.lastAggPushdown.get should include("MIN(id)")
    // filtered UNGROUPED bounds: one metadata row
    val f = t.filter(col("part") === "p2")
      .agg(min("id").as("mn"), max("id").as("mx"))
    isLocalPlan(f) shouldBe true
    f.head() shouldBe org.apache.spark.sql.Row(2L, 38L)
    // ...over a no-match filter: NULL bounds, like SQL over zero rows
    val z = t.filter(col("part") === "nope").agg(min("id").as("mn"))
    isLocalPlan(z) shouldBe true
    z.head().isNullAt(0) shouldBe true
    // a deletion vector may have removed the extreme row: bounds
    // decline (correct via the scan), grouped COUNT stays metadata
    TxLog.deleteVectored(spark, root, col("id") === 100L)
    val t2 = spark.read.format("graft").load(root)
    GraftDataSource.lastAggPushdown = None
    val g2 = t2.groupBy("part").agg(max("id").as("mx"))
    isLocalPlan(g2) shouldBe false
    g2.orderBy("part").collect().map(_.getLong(1)).toSeq shouldBe
      Seq(36L, 37L, 38L, 39L)
    val c2 = t2.groupBy("part").agg(count(lit(1)).as("n"))
    isLocalPlan(c2) shouldBe true
    c2.orderBy("part").collect().map(_.getLong(1)).toSeq shouldBe
      Seq(10L, 10L, 10L, 10L)
    // a stat-less column (the partition column itself carries no file
    // stats) declines to the scan, result exact
    val np = t2.groupBy("part").agg(max("part").as("mx"))
    isLocalPlan(np) shouldBe false
    np.count() shouldBe 4L
  }

  test("partition tier: integral partition values group under their typed column; a fully-deleted partition surfaces no group") {
    val root = tmpRoot()
    TxLog.append(spark,
      (0L until 30L).map(i => (i, i % 3)).toDF("id", "bucket"),
      root, partitionCols = Seq("bucket"), statsCols = Seq("id"))
    TxLog.deleteVectored(spark, root, col("bucket") === 2L)
    val t = spark.read.format("graft").load(root)
    val grouped = t.groupBy("bucket").agg(count(lit(1)).as("n"))
    isLocalPlan(grouped) shouldBe true
    grouped.orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((0L, 10L), (1L, 10L)) // bucket 2 fully vectored: NO group row
    // the typed filter value matches the typed path value
    val f = t.filter(col("bucket") === 1L).agg(count(lit(1)).as("n"))
    isLocalPlan(f) shouldBe true
    f.head().getLong(0) shouldBe 10L
    // IN over partition values is a per-column disjunction the tier
    // absorbs; the fully-deleted member contributes zero
    val in = t.filter(col("bucket").isin(0L, 2L)).agg(count(lit(1)).as("n"))
    isLocalPlan(in) shouldBe true
    in.head().getLong(0) shouldBe 10L
    val inG = t.filter(col("bucket").isin(0L, 1L)).groupBy("bucket")
      .agg(count(lit(1)).as("n"))
    isLocalPlan(inG) shouldBe true
    inG.orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((0L, 10L), (1L, 10L))
  }

  test("aggregate pushdown DECLINES exactly when metadata can't answer — results stay correct") {
    val root = clusteredTable()
    // a filter makes COUNT non-metadata: decline, Spark scans
    GraftDataSource.lastAggPushdown = None
    val filtered = spark.read.format("graft").load(root)
      .filter(col("id") >= 10L).agg(count(lit(1)).as("n"))
    isLocalPlan(filtered) shouldBe false
    filtered.head().getLong(0) shouldBe 30L
    GraftDataSource.lastAggPushdown shouldBe None
    // GROUP BY declines
    val grouped = spark.read.format("graft").load(root)
      .groupBy((col("id") / 10).cast("int").as("b")).agg(count(lit(1)))
    isLocalPlan(grouped) shouldBe false
    grouped.count() shouldBe 4L
    // MIN/MAX of a STRING column declines (stats are numeric-only) and
    // takes COUNT down with it — partial answers are never served
    val withString = spark.read.format("graft").load(root)
      .agg(count(lit(1)).as("n"), max("s").as("mx"))
    isLocalPlan(withString) shouldBe false
    withString.head() shouldBe org.apache.spark.sql.Row(40L, "s3-9")
    // a table written WITHOUT statsCols has no row counts: decline
    val bare = tmpRoot()
    TxLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1), bare)
    val noStats = spark.read.format("graft").load(bare)
      .agg(count(lit(1)).as("n"))
    isLocalPlan(noStats) shouldBe false
    noStats.head().getLong(0) shouldBe 2L
  }

  test("clean-dominates: bounds stay metadata-answered when a vector-free file holds the extremes") {
    val root = tmpRoot()
    // two files per partition: the EDGE file holds each partition's
    // extremes, the INTERIOR file only middle ids — then the vector
    // lands entirely in the interior file
    for (p <- 0 to 1) {
      TxLog.append(spark,
        Seq((p * 100L, s"p$p"), (p * 100L + 99L, s"p$p"))
          .toDF("id", "part").repartition(1),
        root, partitionCols = Seq("part"), statsCols = Seq("id"))
      TxLog.append(spark,
        (p * 100L + 40L to p * 100L + 49L).map((_, s"p$p"))
          .toDF("id", "part").repartition(1),
        root, partitionCols = Seq("part"), statsCols = Seq("id"))
    }
    TxLog.deleteVectored(spark, root, col("id") % 100 >= 40 &&
      col("id") % 100 < 45)
    val t = spark.read.format("graft").load(root)
    GraftDataSource.lastAggPushdown = None
    val g = t.groupBy("part").agg(count(lit(1)).as("n"),
      min("id").as("mn"), max("id").as("mx"))
    isLocalPlan(g) shouldBe true
    g.orderBy("part").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq shouldBe Seq(("p0", 7L, 0L, 99L), ("p1", 7L, 100L, 199L))
    GraftDataSource.lastAggPushdown.get should include("MIN(id)")
    // ungrouped over the same table: the global fold of the answered
    // per-partition bounds, still metadata
    val u = t.agg(count(lit(1)).as("n"), min("id").as("mn"),
      max("id").as("mx"))
    isLocalPlan(u) shouldBe true
    u.head() shouldBe org.apache.spark.sql.Row(14L, 0L, 199L)
    // but once the vector CAN hide an extreme (it reaches the edge
    // file), the aggregation declines and the scan answers exactly
    TxLog.deleteVectored(spark, root, col("id") === 199L)
    val t2 = spark.read.format("graft").load(root)
    val g2 = t2.groupBy("part").agg(max("id").as("mx"))
    isLocalPlan(g2) shouldBe false
    g2.orderBy("part").collect().map(_.getLong(1)).toSeq shouldBe
      Seq(99L, 149L)
  }

  test("a deletion vector: COUNT stays metadata-only, MIN/MAX falls back to the scan") {
    val root = tmpRoot()
    TxLog.append(spark, (0L until 10L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartition(1), root, statsCols = Seq("id"))
    TxLog.deleteVectored(spark, root, col("id") >= 8L)
    // the vector carries its row count in the commit: COUNT(*) alone is
    // still answered without opening the file
    GraftDataSource.lastAggPushdown = None
    val cnt = spark.read.format("graft").load(root).agg(count(lit(1)).as("n"))
    isLocalPlan(cnt) shouldBe true
    cnt.head().getLong(0) shouldBe 8L
    GraftDataSource.lastAggPushdown shouldBe Some("COUNT(*)")
    // MAX would serve the vector-deleted row (stats still claim 9):
    // the whole aggregation declines and the scan answers exactly
    val mx = spark.read.format("graft").load(root)
      .agg(count(lit(1)).as("n"), max("id").as("mx"))
    isLocalPlan(mx) shouldBe false
    mx.head() shouldBe org.apache.spark.sql.Row(8L, 7L)
  }

  test("long bounds beyond the stats' double space decline instead of rounding") {
    val root = tmpRoot()
    val big = Long.MaxValue - 1L // not representable in double
    TxLog.append(spark, Seq((1L, "a"), (big, "b")).toDF("id", "s")
      .repartition(1), root, statsCols = Seq("id"))
    val df = spark.read.format("graft").load(root)
      .agg(max("id").as("mx"))
    isLocalPlan(df) shouldBe false // declined: double can't round-trip it
    df.head().getLong(0) shouldBe big // the scan still answers exactly
  }
}

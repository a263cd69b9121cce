package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL DML over the commit log: statements in Spark's own grammar reach
  * TxLog.delete/update/merge, commit one version each, and keep the
  * registered read view current.
  */
class TxLogSqlSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(name: String): String = {
    val root = Files.createTempDirectory("graft-txsql").toString
    val base = Seq(
      (1L, "a", 10.0, "p1"), (2L, "b", -5.0, "p1"),
      (3L, "c", 7.0, "p2"), (4L, "d", 0.0, "p2"))
      .toDF("id", "s", "bal", "part")
    TxLog.append(spark, base, root, Seq("part"))
    TxLogSql.register(spark, name, root, partitionCols = Seq("part"))
    root
  }

  test("DELETE FROM removes matching rows and refreshes the read view") {
    freshTable("dml_del")
    val v = TxLogSql.execute(spark, "DELETE FROM dml_del WHERE bal < 0")
    v shouldBe 1L
    spark.sql("SELECT id FROM dml_del ORDER BY id").as[Long].collect()
      .toSeq shouldBe Seq(1L, 3L, 4L)
  }

  test("UPDATE applies SET expressions under an alias-qualified WHERE") {
    freshTable("dml_upd")
    TxLogSql.execute(spark,
      "UPDATE dml_upd AS t SET bal = t.bal * 2, s = upper(t.s) WHERE t.part = 'p1'")
    spark.sql("SELECT id, s, bal FROM dml_upd ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq shouldBe Seq(
      (1L, "A", 20.0), (2L, "B", -10.0), (3L, "c", 7.0), (4L, "d", 0.0))
  }

  test("UPDATE without WHERE touches every row") {
    freshTable("dml_updall")
    TxLogSql.execute(spark, "UPDATE dml_updall SET bal = 1.5")
    spark.sql("SELECT DISTINCT bal FROM dml_updall").as[Double].collect()
      .toSeq shouldBe Seq(1.5)
  }

  test("MERGE INTO upserts from a temp-view source (replace matched, insert new)") {
    freshTable("dml_mrg")
    Seq((2L, "B!", 99.0, "p1"), (9L, "new", 1.0, "p2"))
      .toDF("id", "s", "bal", "part").createOrReplaceTempView("dml_src")
    val v = TxLogSql.execute(spark,
      """MERGE INTO dml_mrg t USING dml_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    v shouldBe 1L
    spark.sql("SELECT id, s, bal FROM dml_mrg ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq shouldBe Seq(
      (1L, "a", 10.0), (2L, "B!", 99.0), (3L, "c", 7.0),
      (4L, "d", 0.0), (9L, "new", 1.0))
  }

  test("INSERT INTO appends positionally; INSERT OVERWRITE replaces the table") {
    freshTable("dml_ins")
    // positional: the SELECT's aliases differ from the table's columns —
    // they must align by position, not evolve the schema
    TxLogSql.execute(spark,
      """INSERT INTO dml_ins
        |SELECT 9 AS a, 'i' AS b, CAST(1.5 AS DOUBLE) AS c, 'p3' AS d""".stripMargin)
    spark.sql("SELECT id, s, bal, part FROM dml_ins WHERE id = 9")
      .as[(Long, String, Double, String)].head() shouldBe ((9L, "i", 1.5, "p3"))
    spark.table("dml_ins").columns.toSeq shouldBe
      Seq("id", "s", "bal", "part")

    TxLogSql.execute(spark,
      """INSERT OVERWRITE dml_ins
        |SELECT 1 AS id, 'only' AS s, CAST(0 AS DOUBLE) AS bal, 'p1' AS part""".stripMargin)
    spark.sql("SELECT id, s FROM dml_ins").as[(Long, String)].collect()
      .toSeq shouldBe Seq((1L, "only"))

    // arity mismatch fails loudly instead of misaligning
    val e = intercept[IllegalArgumentException] {
      TxLogSql.execute(spark, "INSERT INTO dml_ins SELECT 1, 'x'")
    }
    e.getMessage should include("arity")
  }

  test("sequential DML statements stack, one commit each") {
    val root = freshTable("dml_seq")
    TxLogSql.execute(spark, "DELETE FROM dml_seq WHERE id = 4")
    TxLogSql.execute(spark, "UPDATE dml_seq SET bal = bal + 1 WHERE part = 'p2'")
    TxLogSql.execute(spark,
      """MERGE INTO dml_seq USING (SELECT 3 AS id, 'C' AS s,
        |  CAST(100 AS DOUBLE) AS bal, 'p2' AS part) src ON dml_seq.id = src.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    TxLog.latestVersion(spark, root) shouldBe Some(3L)
    spark.sql("SELECT id, bal FROM dml_seq ORDER BY id")
      .as[(Long, Double)].collect().toSeq shouldBe Seq(
      (1L, 10.0), (2L, -5.0), (3L, 100.0))
  }

  test("unsupported shapes fail loudly instead of mis-executing") {
    freshTable("dml_err")
    // partial-column merge action: the commit log merges whole rows
    val e1 = intercept[IllegalArgumentException] {
      TxLogSql.execute(spark,
        """MERGE INTO dml_err t USING dml_err s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET bal = 0""".stripMargin)
    }
    e1.getMessage should include("UPDATE SET *")
    // non-equi ON condition
    val e2 = intercept[IllegalArgumentException] {
      TxLogSql.execute(spark,
        """MERGE INTO dml_err t USING dml_err s ON t.id < s.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    e2.getMessage should include("conjunction")
    // unregistered table
    val e3 = intercept[IllegalArgumentException] {
      TxLogSql.execute(spark, "DELETE FROM nobody_home WHERE 1 = 1")
    }
    e3.getMessage should include("not TxLogSql-registered")
    // reads are not DML
    val e4 = intercept[IllegalArgumentException] {
      TxLogSql.execute(spark, "SELECT * FROM dml_err")
    }
    e4.getMessage should include("not a DML statement")
  }

  // ---------------------------------------------------------------------
  // Maintenance statements (TxLogSql.run)
  // ---------------------------------------------------------------------

  /** A fragmented table: four single-file appends of one row each. */
  private def fragmentedTable(name: String): String = {
    val root = Files.createTempDirectory("graft-txsql").toString
    (1L to 4L).foreach { i =>
      TxLog.append(spark,
        Seq((i, s"r$i", i * 1.0)).toDF("id", "s", "bal").coalesce(1), root)
    }
    TxLogSql.register(spark, name, root)
    root
  }

  test("DESCRIBE HISTORY returns the commit log as a DataFrame") {
    fragmentedTable("mnt_hist")
    TxLogSql.execute(spark, "DELETE FROM mnt_hist WHERE id = 4")
    val h = TxLogSql.run(spark, "DESCRIBE HISTORY mnt_hist")
      .select("version", "operation", "num_added_files", "num_removed_files")
      .as[(Long, String, Int, Int)].collect().toSeq
    h.map(_._1) shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    h.map(_._2) shouldBe Seq("append", "append", "append", "append", "delete")
    h.last._4 shouldBe 1 // the delete removed one single-row file
  }

  test("DESCRIBE DETAIL reports table health; OPTIMIZE empties the small-file count") {
    val root = fragmentedTable("mnt_det")
    val d1 = TxLogSql.run(spark, "DESCRIBE DETAIL mnt_det")
      .select("version", "num_files", "num_small_files",
        "num_files_with_stats")
      .as[(Long, Long, Long, Long)].head()
    d1 shouldBe ((3L, 4L, 4L, 0L)) // fragmented commits carry no stats
    TxLogSql.run(spark, "OPTIMIZE mnt_det")
    val d2 = TxLogSql.run(spark, "DESCRIBE DETAIL mnt_det")
      .select("version", "num_files").as[(Long, Long)].head()
    d2 shouldBe ((4L, 1L))
    // ANALYZE flips the coverage signal to full
    TxLog.analyzeStats(spark, root, Seq("id"))
    TxLogSql.run(spark, "DESCRIBE DETAIL mnt_det")
      .select("num_files", "num_files_with_stats")
      .as[(Long, Long)].head() shouldBe ((1L, 1L))
  }

  test("DESCRIBE SCAN previews planned bytes against the session budget") {
    val root = fragmentedTable("mnt_scan")
    // Uncapped session: planned bytes are the table's live file bytes and
    // the (absent) budget reports as -1 / within.
    val expected = TxLog.liveSizes(spark, root).map(_._2).sum
    val p1 = TxLogSql.run(spark, "DESCRIBE SCAN SELECT id FROM mnt_scan")
      .as[(Long, Long, Boolean)].head()
    p1 shouldBe ((expected, -1L, true))
    // Capped below the table size: the preview REPORTS over-budget rather
    // than throwing — DESCRIBE SCAN is the cost check you run to avoid the
    // enforcement failure, so it must not fail the same way itself.
    spark.conf.set(graft.plans.ScanBudget.ConfKey, "1")
    try {
      val p2 = TxLogSql.run(spark, "DESCRIBE SCAN SELECT id FROM mnt_scan")
        .as[(Long, Long, Boolean)].head()
      p2 shouldBe ((expected, 1L, false))
    } finally spark.conf.unset(graft.plans.ScanBudget.ConfKey)
  }

  test("DESCRIBE SCAN charges a catalog-identifier commit-log scan its planned bytes") {
    // a cat.db.t scan plans as RowDataSourceScanExec over the V1
    // fallback — opaque to the file-scan accounting; the relation's own
    // planned-bytes seam must charge it (zero would let any 100 TB
    // catalog query sail under the budget)
    val s = spark.newSession()
    s.conf.set("spark.sql.catalog.gsc", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gsc.warehouse",
      java.nio.file.Files.createTempDirectory("graft-scanbudget-wh").toString)
    s.sql("CREATE NAMESPACE gsc.db")
    s.sql("CREATE TABLE gsc.db.t (id BIGINT, s STRING) USING graft")
    s.sql("INSERT INTO gsc.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val root = s"${s.conf.get("spark.sql.catalog.gsc.warehouse")}/db/t"
    val expected = TxLog.liveSizes(s, root).map(_._2).sum
    expected should be > 0L
    val p1 = TxLogSql.run(s, "DESCRIBE SCAN SELECT id FROM gsc.db.t")
      .collect().head
    p1.getLong(0) shouldBe expected
    p1.getBoolean(2) shouldBe true
    // the session budget binds the same number
    s.conf.set(graft.plans.ScanBudget.ConfKey, "1")
    try {
      TxLogSql.run(s, "DESCRIBE SCAN SELECT id FROM gsc.db.t")
        .collect().head.getBoolean(2) shouldBe false
    } finally s.conf.unset(graft.plans.ScanBudget.ConfKey)
  }

  test("MAINTAIN runs the composed pass; the second pass truncates the log") {
    val root = fragmentedTable("mnt_pass")
    val r1 = TxLogSql.run(spark, "MAINTAIN mnt_pass RETAIN 2 VERSIONS")
      .collect().head
    r1.getLong(0) shouldBe 4L               // files_before
    r1.getLong(1) should be < r1.getLong(0) // bin-packed
    // first pass: the checkpoint just written is the only anchor, and
    // truncating to it would cut the retained snapshots — deferred
    r1.getBoolean(4) shouldBe false
    spark.read.format("graft").load(root).count() shouldBe 4L
    // one more commit, then the second pass truncates down to the first
    // pass's checkpoint without breaking reads or stranding files
    TxLog.append(spark,
      Seq((9L, "r9", 9.0)).toDF("id", "s", "bal"), root)
    val r2 = TxLogSql.run(spark, "MAINTAIN mnt_pass RETAIN 2 VERSIONS")
      .collect().head
    r2.getBoolean(4) shouldBe true
    r2.getLong(3) should be > 0L  // raw log entries below the horizon
    r2.getLong(2) should be > 0L  // the pre-compact files reclaimed
    spark.read.format("graft").load(root).count() shouldBe 5L
  }

  test("DESCRIBE SCAN rejects commands instead of executing them") {
    fragmentedTable("mnt_scan_ro")
    // spark.sql() runs commands eagerly — a DDL payload must be rejected
    // BEFORE reaching it, or the "no-read preview" would drop/shadow the
    // registered view for real.
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "DESCRIBE SCAN DROP VIEW mnt_scan_ro")
    }
    e.getMessage should include("read-only query")
    // the registered view survived, and query-shaped heads still pass
    spark.sql("SELECT count(*) FROM mnt_scan_ro").as[Long].head() shouldBe 4L
    TxLogSql.run(spark,
      "DESCRIBE SCAN (SELECT id FROM mnt_scan_ro WHERE id = 1)")
      .count() shouldBe 1L
    // CTE-headed DML: the head IS `WITH`, so the head regex alone passes
    // it — the parse-level guard must reject before spark.sql() runs the
    // INSERT for real
    val cte = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "DESCRIBE SCAN WITH s AS (SELECT 99 AS id, " +
        "'x' AS v, 'p' AS part) INSERT INTO mnt_scan_ro SELECT * FROM s")
    }
    cte.getMessage should include("read-only")
    spark.sql("SELECT count(*) FROM mnt_scan_ro").as[Long].head() shouldBe 4L
    // a genuine CTE-headed SELECT still previews fine
    TxLogSql.run(spark, "DESCRIBE SCAN WITH s AS (SELECT id FROM " +
      "mnt_scan_ro) SELECT * FROM s").count() shouldBe 1L
  }

  test("OPTIMIZE bin-packs small files without changing the result") {
    val root = fragmentedTable("mnt_opt")
    val before = TxLog.liveSizes(spark, root).size
    val res = TxLogSql.run(spark, "OPTIMIZE mnt_opt")
      .select("version", "operation").as[(Long, String)].head()
    res shouldBe ((4L, "optimize"))
    TxLog.liveSizes(spark, root).size should be < before
    spark.sql("SELECT id FROM mnt_opt ORDER BY id").as[Long].collect()
      .toSeq shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("OPTIMIZE WHERE packs only the scoped partition") {
    val root = Files.createTempDirectory("graft-txsql").toString
    // two fragmented appends -> 2 small files in EACH partition dir
    (0 until 2).foreach { i =>
      TxLog.append(spark,
        Seq((i * 10L + 1, "p1"), (i * 10L + 2, "p2"))
          .toDF("id", "part").repartition(col("part")),
        root, partitionCols = Seq("part"))
    }
    TxLogSql.register(spark, "mnt_scoped", root,
      partitionCols = Seq("part"))
    def filesIn(p: String): Int =
      TxLog.liveSizes(spark, root).count(_._1.startsWith(s"part=$p/"))
    filesIn("p1") shouldBe 2
    TxLogSql.run(spark, "OPTIMIZE mnt_scoped WHERE part = 'p1'")
    filesIn("p1") shouldBe 1 // packed
    filesIn("p2") shouldBe 2 // out of scope, untouched
    spark.sql("SELECT COUNT(*) FROM mnt_scoped").as[Long].head() shouldBe 4L
    // row predicates are rejected, not silently ignored
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "OPTIMIZE mnt_scoped WHERE id > 5")
    }
    e.getMessage should include("partition equalities")
    // a typo'd / non-partition column in an equality fails loudly too:
    // matching zero directories must not report success as a no-op
    val e2 = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "OPTIMIZE mnt_scoped WHERE prat = 'p1'")
    }
    e2.getMessage should include("non-partition")
  }

  test("OPTIMIZE ZORDER BY rewrites through clusterZ and keeps rows") {
    val root = fragmentedTable("mnt_z")
    TxLogSql.run(spark, "OPTIMIZE mnt_z ZORDER BY (id, bal)")
    spark.sql("SELECT id FROM mnt_z ORDER BY id").as[Long].collect()
      .toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    // the Z-order rewrite carries stats for its columns, so a range read
    // on either column still prunes
    TxLog.readRange(spark, root, "id", 1, 2).count() shouldBe 2L
  }

  test("RESTORE TO VERSION AS OF undoes a bad delete as a new commit") {
    val root = fragmentedTable("mnt_rst")
    TxLogSql.execute(spark, "DELETE FROM mnt_rst WHERE bal >= 0") // oops: all
    spark.sql("SELECT COUNT(*) FROM mnt_rst").as[Long].head() shouldBe 0L
    val res = TxLogSql.run(spark,
      "RESTORE TABLE mnt_rst TO VERSION AS OF 3")
      .select("version", "operation").as[(Long, String)].head()
    res shouldBe ((5L, "restore"))
    spark.sql("SELECT id FROM mnt_rst ORDER BY id").as[Long].collect()
      .toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    TxLog.latestVersion(spark, root) shouldBe Some(5L) // undo = new commit
  }

  test("VACUUM RETAIN n VERSIONS deletes only files dead to the window") {
    val root = fragmentedTable("mnt_vac")
    TxLogSql.run(spark, "OPTIMIZE mnt_vac") // v4: 4 fragments -> 1 packed
    // DRY RUN first: same victim list, nothing touched
    val preview = TxLogSql.run(spark,
      "VACUUM mnt_vac RETAIN 1 VERSIONS DRY RUN")
    preview.columns.toSeq shouldBe Seq("would_delete_file")
    preview.count() shouldBe 4L
    TxLog.readAt(spark, root, 2L).count() shouldBe 3L // time travel intact
    val deleted = TxLogSql.run(spark, "VACUUM mnt_vac RETAIN 1 VERSIONS")
      .as[String].collect().toSeq
    deleted should have size 4 // the packed-away fragments
    // latest snapshot unharmed; pre-compaction time travel is forfeited
    spark.sql("SELECT COUNT(*) FROM mnt_vac").as[Long].head() shouldBe 4L
    intercept[Exception] { TxLog.readAt(spark, root, 2L).collect() }
  }

  test("VACUUM RETAIN n HOURS maps the wall-clock window to versions") {
    val root = fragmentedTable("mnt_vach")
    TxLogSql.run(spark, "OPTIMIZE mnt_vach") // packs away 4 fragments
    // everything was committed seconds ago: a 1000-hour window retains
    // every version, so nothing is reclaimable
    TxLogSql.run(spark, "VACUUM mnt_vach RETAIN 1000 HOURS DRY RUN")
      .count() shouldBe 0L
    // a zero-hour window keeps only the head: the packed-away fragments
    // become victims, exactly like RETAIN 1 VERSIONS
    val gone = TxLogSql.run(spark, "VACUUM mnt_vach RETAIN 0 HOURS")
      .as[String].collect().toSeq
    gone should have size 4
    spark.sql("SELECT COUNT(*) FROM mnt_vach").as[Long].head() shouldBe 4L
    TxLogSql.unregister(spark, "mnt_vach")
  }

  test("VACUUM RETAIN n HOURS keeps the version live at the window start (in-window time travel survives)") {
    val root = Files.createTempDirectory("graft-vach2").toString
    TxLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root) // v0
    TxLogSql.register(spark, "mnt_vach2", root)
    try {
      TxLogSql.execute(spark, "DELETE FROM mnt_vach2 WHERE id = 1")     // v1 rewrites
      // backdate: v0 five hours old, v1 one hour old — a 2-hour window
      // starts INSIDE v0's reign, so v0's files must survive the vacuum
      val now = System.currentTimeMillis()
      Seq(0L -> (now - 5 * 3600 * 1000L), 1L -> (now - 1 * 3600 * 1000L))
        .foreach { case (v, ts) =>
          val p = java.nio.file.Paths.get(f"$root/_txlog/$v%020d.json")
          val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          java.nio.file.Files.write(p, s.replaceAll(
            "\"timestampMs\":\\d+", s""""timestampMs":$ts""").getBytes("UTF-8"))
        }
      TxLogSql.run(spark, "VACUUM mnt_vach2 RETAIN 2 HOURS")
        .count() shouldBe 0L // v0 anchors the window: nothing reclaimable
      // the in-window instant (90 min ago) still resolves and reads v0
      TxLog.readAtTimestamp(spark, root,
        now - 90 * 60 * 1000L).count() shouldBe 2L
    } finally TxLogSql.unregister(spark, "mnt_vach2")
  }

  test("RESTORE TO TIMESTAMP AS OF resolves by wall clock (epoch-ms form)") {
    val root = fragmentedTable("mnt_rst_ts")
    val tsAfterLoad = TxLog.history(spark, root).last.timestampMs
    Thread.sleep(5)
    TxLogSql.execute(spark, "DELETE FROM mnt_rst_ts WHERE bal >= 0")
    TxLogSql.run(spark,
      s"RESTORE TABLE mnt_rst_ts TO TIMESTAMP AS OF '$tsAfterLoad'")
    spark.sql("SELECT COUNT(*) FROM mnt_rst_ts").as[Long].head() shouldBe 4L
    // an unparseable literal fails loudly
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "RESTORE TABLE mnt_rst_ts TO TIMESTAMP AS OF 'yesterday-ish'")
    }
    e.getMessage should include("cannot parse")
  }

  test("CLONE ... TO ... AS forks a table through SQL; the clone is immediately DML-addressable") {
    val srcRoot = fragmentedTable("mnt_clsrc")
    val dstRoot = Files.createTempDirectory("graft-txsql-clone").toString + "/t"
    val res = TxLogSql.run(spark,
      s"CLONE mnt_clsrc TO '$dstRoot' AS mnt_clone")
      .select("version", "operation").as[(Long, String)].head()
    res shouldBe ((0L, "clone"))
    spark.sql("SELECT id FROM mnt_clone ORDER BY id").as[Long].collect()
      .toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    // DML on the clone diverges locally; the source is untouched
    TxLogSql.execute(spark, "DELETE FROM mnt_clone WHERE id <= 2")
    spark.sql("SELECT COUNT(*) FROM mnt_clone").as[Long].head() shouldBe 2L
    spark.sql("SELECT COUNT(*) FROM mnt_clsrc").as[Long].head() shouldBe 4L
    TxLog.latestVersion(spark, srcRoot) shouldBe Some(3L)
  }

  test("maintenance statements on an unregistered table fail loudly") {
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "OPTIMIZE nobody_home")
    }
    e.getMessage should include("not TxLogSql-registered")
  }

  test("run() falls through to DML and reports the committed version") {
    fragmentedTable("mnt_dml")
    val res = TxLogSql.run(spark, "DELETE FROM mnt_dml WHERE id = 1")
      .select("version", "operation").as[(Long, String)].head()
    res shouldBe ((4L, "dml"))
  }

  test("run() passes reads through: one SQL entry point end to end") {
    fragmentedTable("mnt_sel")
    TxLogSql.run(spark, "DELETE FROM mnt_sel WHERE id = 4")
    val rows = TxLogSql.run(spark,
      "SELECT id, s FROM mnt_sel ORDER BY id")
      .as[(Long, String)].collect().toSeq
    rows shouldBe Seq((1L, "r1"), (2L, "r2"), (3L, "r3"))
  }

  test("CTE-prefixed DML is rejected loudly, never passed around the commit log") {
    fragmentedTable("mnt_cte")
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        """WITH s AS (SELECT 9 AS id, 'x' AS s, CAST(0 AS DOUBLE) AS bal)
          |INSERT INTO mnt_cte SELECT * FROM s""".stripMargin)
    }
    e.getMessage should include("CTE-prefixed DML")
    // nothing committed, nothing written around the log
    spark.sql("SELECT COUNT(*) FROM mnt_cte").as[Long].head() shouldBe 4L
  }

  test("DML on an unregistered catalog table passes through to spark.sql") {
    spark.sql("DROP TABLE IF EXISTS plain_cat_tbl")
    spark.sql("CREATE TABLE plain_cat_tbl (id BIGINT) USING PARQUET")
    try {
      TxLogSql.run(spark, "INSERT INTO plain_cat_tbl VALUES (7)")
      TxLogSql.run(spark, "SELECT id FROM plain_cat_tbl").as[Long]
        .collect().toSeq shouldBe Seq(7L)
      // execute() — the DML-only entry — still fails loudly instead
      val e = intercept[IllegalArgumentException] {
        TxLogSql.execute(spark, "INSERT INTO plain_cat_tbl VALUES (8)")
      }
      e.getMessage should include("not TxLogSql-registered")
    } finally spark.sql("DROP TABLE IF EXISTS plain_cat_tbl")
  }

  test("view DDL naming a registered table is rejected, not passed through") {
    fragmentedTable("mnt_guard")
    val e1 = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "DROP VIEW mnt_guard")
    }
    e1.getMessage should include("registered table")
    val e2 = intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "CREATE OR REPLACE TEMP VIEW mnt_guard AS SELECT 1 AS id")
    }
    e2.getMessage should include("registered table")
    // ALTER VIEW ... AS redefines the view just like CREATE OR REPLACE —
    // equally rejected
    val e3 = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ALTER VIEW mnt_guard AS SELECT 1 AS id")
    }
    e3.getMessage should include("registered table")
    // the table still reads correctly through the surface
    TxLogSql.run(spark, "SELECT COUNT(*) FROM mnt_guard").as[Long]
      .head() shouldBe 4L
    // view DDL on unrelated names passes through fine
    TxLogSql.run(spark, "CREATE OR REPLACE TEMP VIEW mnt_other AS SELECT 1 AS x")
    TxLogSql.run(spark, "DROP VIEW mnt_other")
  }

  test("SELECT ... VERSION AS OF reads a pinned snapshot through plain SQL") {
    val root = freshTable("tt_read")
    TxLogSql.execute(spark, "DELETE FROM tt_read WHERE bal < 0")  // v1
    TxLogSql.execute(spark, "UPDATE tt_read SET bal = bal + 1")   // v2
    // live view reflects v2; the pinned read reproduces v0 exactly
    TxLogSql.run(spark, "SELECT count(*) AS n FROM tt_read")
      .head().getLong(0) shouldBe 3L
    TxLogSql.run(spark,
      "SELECT count(*) AS n FROM tt_read VERSION AS OF 0")
      .head().getLong(0) shouldBe 4L
    // pinned and live compose in ONE statement (the before/after join)
    val drifted = TxLogSql.run(spark,
      """SELECT v0.id FROM tt_read VERSION AS OF 0 v0
        |LEFT JOIN tt_read cur ON v0.id = cur.id
        |WHERE cur.id IS NULL ORDER BY v0.id""".stripMargin)
      .as[Long].collect().toSeq
    drifted shouldBe Seq(2L) // the deleted negative-balance row
    // TIMESTAMP AS OF far in the future resolves to the latest version
    TxLogSql.run(spark,
      "SELECT count(*) AS n FROM tt_read TIMESTAMP AS OF '2999-01-01 00:00:00'")
      .head().getLong(0) shouldBe 3L
    // CTE bodies are NOT plan children (UnresolvedWith is unary) — the
    // substitution must reach inside WITH definitions too
    TxLogSql.run(spark,
      """WITH old AS (SELECT id FROM tt_read VERSION AS OF 0)
        |SELECT count(*) AS n FROM old""".stripMargin)
      .head().getLong(0) shouldBe 4L
  }

  test("table_changes('t', after[, to]) reads the change feed through SQL") {
    val root = freshTable("tt_cdc")
    TxLogSql.execute(spark, "DELETE FROM tt_cdc WHERE bal < 0")     // v1
    TxLogSql.execute(spark,
      "INSERT INTO tt_cdc VALUES (9, 'i', 1.0, 'p2')")              // v2
    // the full delta after v0: v1's delete + v2's insert
    TxLogSql.run(spark,
      """SELECT _change_type, _commit_version, id
        |FROM table_changes('tt_cdc', 0) ORDER BY _commit_version, id""".stripMargin)
      .as[(String, Long, Long)].collect().toSeq shouldBe Seq(
      ("delete", 1L, 2L), ("insert", 2L, 9L))
    // bounded window + aggregation over the feed
    TxLogSql.run(spark,
      """SELECT count(*) AS n FROM table_changes('tt_cdc', 0, 1)
        |WHERE _change_type = 'delete'""".stripMargin)
      .head().getLong(0) shouldBe 1L
    // timestamp bounds: a string instant selects at-or-after; numeric
    // literals stay versions
    val ts1 = java.time.Instant.ofEpochMilli(
      TxLog.history(spark, root).find(_.version == 1L).get.timestampMs)
      .toString
    TxLogSql.run(spark,
      s"""SELECT _commit_version FROM table_changes('tt_cdc', '$ts1')
         |ORDER BY _commit_version""".stripMargin)
      .as[Long].collect().toSeq shouldBe Seq(1L, 2L)
    TxLogSql.run(spark,
      s"""SELECT count(*) AS n
         |FROM table_changes('tt_cdc', 0, '$ts1')
         |WHERE _change_type = 'delete'""".stripMargin)
      .head().getLong(0) shouldBe 1L
    // a QUOTED all-digit string is epoch milliseconds (the literal's
    // TYPE decides version-vs-timestamp), matching the streaming
    // startingTimestamp option — not a gigantic version number
    val ms1 = TxLog.history(spark, root).find(_.version == 1L).get.timestampMs
    TxLogSql.run(spark,
      s"""SELECT _commit_version FROM table_changes('tt_cdc', '$ms1')
         |ORDER BY _commit_version""".stripMargin)
      .as[Long].collect().toSeq shouldBe Seq(1L, 2L)
    // misuse fails loudly: non-literal args, bad version, unregistered
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "SELECT * FROM table_changes('tt_cdc', id)")
    }
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "SELECT * FROM table_changes('tt_cdc', 'x')")
    }
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "SELECT * FROM table_changes('nope', 0)")
    }
  }

  test("time-travel misuse fails loudly; unregistered tables keep Spark's error") {
    freshTable("tt_bad")
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "SELECT * FROM tt_bad VERSION AS OF 'abc'")
    }
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "SELECT * FROM tt_bad TIMESTAMP AS OF current_timestamp()")
    }
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("tt_plain")
    intercept[Exception] {
      TxLogSql.run(spark, "SELECT * FROM tt_plain VERSION AS OF 0").collect()
    }
  }

  test("INSERT BY NAME aligns case-variant column names onto the table schema") {
    freshTable("dml_byname")
    // batch columns arrive as ID/BAL/S/PART: BY NAME must land them on
    // id/bal/s/part (case-insensitive, same rule as committedDdl), cast
    // to the store types, under the committed casing — not commit new
    // upper-cased columns or trip the commit-time type guard
    TxLogSql.execute(spark,
      """INSERT INTO dml_byname BY NAME
        |SELECT 'p1' AS PART, 9 AS ID, 'z' AS S, 1 AS BAL""".stripMargin)
    spark.sql("SELECT id, s, bal, part FROM dml_byname WHERE id = 9")
      .as[(Long, String, Double, String)].collect().toSeq shouldBe
      Seq((9L, "z", 1.0, "p1"))
  }

  test("ALTER TABLE ADD COLUMNS evolves the schema metadata-only; old rows read NULL") {
    val root = freshTable("ddl_addcols")
    val filesBefore = TxLog.liveSizes(spark, root).toMap
    val res = TxLogSql.run(spark,
      "ALTER TABLE ddl_addcols ADD COLUMNS (score decimal(30,6), tags struct<a:int,b:string>)")
    res.select("operation").as[String].collect().toSeq shouldBe Seq("addColumns")

    // metadata-only: not one data file rewritten
    TxLog.liveSizes(spark, root).toMap shouldBe filesBefore
    // whitelist clamp: decimal passes verbatim, struct degrades to string
    val sch = TxLog.readLatest(spark, root).schema
    sch("score").dataType.simpleString shouldBe "decimal(30,6)"
    sch("tags").dataType.simpleString shouldBe "string"
    // the registered view exposes the new columns, old rows null-fill
    spark.sql("SELECT COUNT(*) FROM ddl_addcols WHERE score IS NULL")
      .as[Long].head() shouldBe 4L

    // the evolved column is writable and the pre-evolution rows survive
    TxLog.append(spark,
      Seq((9L, "z", 1.0, "p1", "2.5", "t"))
        .toDF("id", "s", "bal", "part", "score", "tags")
        .withColumn("score", col("score").cast("decimal(30,6)")),
      root, Seq("part"))
    TxLogSql.register(spark, "ddl_addcols", root, partitionCols = Seq("part"))
    spark.sql(
      "SELECT COUNT(*), COUNT(score) FROM ddl_addcols")
      .as[(Long, Long)].head() shouldBe ((5L, 1L))

    // adding an existing column (any case) fails loudly
    val err = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ALTER TABLE ddl_addcols ADD COLUMNS (BAL double)")
    }
    err.getMessage should include("already exists")
  }

  test("ANALYZE TABLE retrofits skipping stats as a data-less commit") {
    val root = Files.createTempDirectory("graft-analyze").toString
    // two stats-LESS appends with disjoint id ranges, one file each
    TxLog.append(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(1), root)
    TxLog.append(spark,
      (1000L to 1100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(1),
      root)
    TxLogSql.register(spark, "ana_t", root)
    val filesBefore = TxLog.liveSizes(spark, root).toMap

    val res = TxLogSql.run(spark,
      "ANALYZE TABLE ana_t COMPUTE STATISTICS FOR COLUMNS id")
    res.select("operation").as[String].collect().toSeq shouldBe Seq("analyze")

    // data-less: same files, commit adds/removes nothing
    TxLog.liveSizes(spark, root).toMap shouldBe filesBefore
    val c = TxLog.history(spark, root).last
    c.add shouldBe empty
    c.remove shouldBe empty

    // proof the stats WORK: corrupt the hi-range file; a pruned range
    // read of the lo range must skip it (pre-ANALYZE it would die), and
    // the metadata count now answers with no data IO at all
    val hiRel = TxLog.history(spark, root)(1).add.head
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/$hiRel"),
      "not parquet".getBytes)
    TxLog.readRange(spark, root, "id", 0, 200).count() shouldBe 100L
    TxLog.countRows(spark, root) shouldBe 201L
  }

  test("ANALYZE is incremental: covered files are never rescanned") {
    val root = Files.createTempDirectory("graft-anainc").toString
    // first file WITH stats at write time; second without
    TxLog.append(spark,
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(1),
      root, statsCols = Seq("id"))
    TxLog.append(spark,
      (1000L to 1100L).map(i => (i, s"r$i")).toDF("id", "s").repartition(1),
      root)
    // corrupt the covered file: an ANALYZE that rescans it would die,
    // the incremental one must only read the uncovered file
    val coveredRel = TxLog.history(spark, root).head.add.head
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/$coveredRel"),
      "not parquet".getBytes)
    TxLogSql.register(spark, "ana_inc", root)
    TxLogSql.run(spark,
      "ANALYZE TABLE ana_inc COMPUTE STATISTICS FOR COLUMNS id")
    // both files now carry bounds: the metadata count needs no data IO
    // (the corrupted file would fail any scan), and a hi-range read
    // prunes the corrupted lo file
    TxLog.countRows(spark, root) shouldBe 201L
    TxLog.readRange(spark, root, "id", 900, 2000).count() shouldBe 101L
    // fully covered: a second ANALYZE is a version-level no-op
    val v = TxLog.history(spark, root).last.version
    TxLogSql.run(spark,
      "ANALYZE TABLE ana_inc COMPUTE STATISTICS FOR COLUMNS id")
    TxLog.history(spark, root).last.version shouldBe v
  }

  test("BLOOMFILTER INDEX lifecycle: CREATE, REFRESH the delta, DROP") {
    val root = Files.createTempDirectory("graft-sqlbloom").toString
    (0 until 2).foreach { c =>
      TxLog.append(spark,
        (0 until 100).map(i => (f"k${(i * 7 + c) % 500}%03d-c$c", c))
          .toDF("k", "commit").repartition(1), root)
    }
    TxLogSql.register(spark, "blm_t", root)
    val created = TxLogSql.run(spark,
      "CREATE BLOOMFILTER INDEX ON TABLE blm_t FOR COLUMNS " +
        "(k OPTIONS (fpp = 0.01, numItems = 1000))")
    created.select("operation", "files_indexed")
      .as[(String, Long)].collect() shouldBe Array(("create_bloom_index", 2L))
    TxLog.append(spark,
      Seq(("fresh-key", 9)).toDF("k", "commit").repartition(1), root)
    val refreshed = TxLogSql.run(spark,
      "REFRESH BLOOMFILTER INDEX ON blm_t FOR COLUMNS (k)")
    refreshed.select("files_indexed").as[Long].collect() shouldBe Array(1L)
    // all three files indexed: an absent key scans zero files
    TxLog.bloomScanFileCount(spark, root, "k", Seq("no-such-key")) shouldBe 0
    // DESCRIBE DETAIL lists the indexed column
    TxLogSql.run(spark, "DESCRIBE DETAIL blm_t")
      .select("bloom_index_columns").as[String].head() shouldBe "k"
    val dropped = TxLogSql.run(spark,
      "DROP BLOOMFILTER INDEX ON blm_t FOR COLUMNS (k)")
    dropped.select("files_indexed").as[Long].collect() shouldBe Array(1L)
    // index gone: lookups degrade to conservative full-candidate scans
    TxLog.bloomScanFileCount(spark, root, "k", Seq("no-such-key")) shouldBe 3
    TxLogSql.run(spark, "DESCRIBE DETAIL blm_t")
      .select("bloom_index_columns").as[String].head() shouldBe ""
    // option hygiene: unknown keys and OPTIONS-on-DROP are refused
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "CREATE BLOOMFILTER INDEX ON blm_t FOR COLUMNS (k OPTIONS (bogus = 1))")
    }.getMessage should include("bogus")
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "DROP BLOOMFILTER INDEX ON blm_t FOR COLUMNS (k OPTIONS (fpp = 0.1))")
    }.getMessage should include("no OPTIONS")
  }

  test("ALTER TABLE DROP COLUMN hides the column metadata-only and blocks re-adding it") {
    val root = freshTable("ddl_dropcol")
    val filesBefore = TxLog.liveSizes(spark, root).toMap
    val res = TxLogSql.run(spark, "ALTER TABLE ddl_dropcol DROP COLUMN bal")
    res.select("operation").as[String].collect().toSeq shouldBe Seq("drop_column")
    // metadata-only: not one data file rewritten
    TxLog.liveSizes(spark, root).toMap shouldBe filesBefore
    // the registered view stops exposing the column
    spark.table("ddl_dropcol").columns.toSeq.sorted shouldBe
      Seq("id", "part", "s")
    intercept[Exception] {
      spark.sql("SELECT bal FROM ddl_dropcol").collect()
    }
    // parenthesized multi-column spelling parses too, and the tombstone
    // blocks ADD COLUMNS from resurrecting stale values
    TxLogSql.run(spark, "ALTER TABLE ddl_dropcol DROP COLUMNS (s)")
    spark.table("ddl_dropcol").columns.toSeq.sorted shouldBe Seq("id", "part")
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ALTER TABLE ddl_dropcol ADD COLUMNS (bal double)")
    }.getMessage should include("DROPPED")
    // pre-drop versions still carry the full schema (time travel)
    TxLog.readAt(spark, root, 0L).columns.toSeq.sorted shouldBe
      Seq("bal", "id", "part", "s")
  }

  test("ANALYZE FOR ALL COLUMNS covers non-partition columns; plain form names the syntax") {
    val root = freshTable("ana_all")
    val res = TxLogSql.run(spark,
      "ANALYZE TABLE ana_all COMPUTE STATISTICS FOR ALL COLUMNS")
    res.select("operation").as[String].collect().toSeq shouldBe Seq("analyze")
    // numeric columns got bounds; the partition column was excluded (its
    // values live in directory names — including it would fail the scan)
    val stats = TxLog.history(spark, root).last.stats
    stats should not be empty
    stats.values.foreach { m =>
      m.keySet should contain allOf ("id", "bal")
      m.keySet should not contain "part"
    }
    // the table-level Spark form is valid syntax this engine has no use
    // for: fail naming the supported forms, don't fall through to a
    // confusing temp-view catalog error
    val e = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ANALYZE TABLE ana_all COMPUTE STATISTICS")
    }
    e.getMessage should include("FOR ALL COLUMNS")
  }

  test("ANALYZE survives schema evolution and canonicalizes column case") {
    val root = Files.createTempDirectory("graft-anaevo").toString
    TxLog.append(spark,
      (1L to 50L).map(i => (i, s"r$i")).toDF("id", "s").repartition(1), root)
    TxLog.addColumns(spark, root, Seq("score" -> "double"))
    TxLog.append(spark,
      (1000L to 1050L).map(i => (i, s"r$i", i * 1.5))
        .toDF("id", "s", "score").repartition(1), root)
    TxLogSql.register(spark, "ana_evo", root)
    // pre-evolution file lacks `score` physically: ANALYZE must read the
    // live set under the TABLE schema (null-fill), not per-file inference
    // — and the UPPERCASE spelling must land as schema-cased stats
    TxLogSql.run(spark,
      "ANALYZE TABLE ana_evo COMPUTE STATISTICS FOR COLUMNS ID, SCORE")
    // stats usable under the schema's casing: corrupt the hi file; a
    // lo-range read must prune it (case-mismatched stats would not)
    val hiRel = TxLog.history(spark, root)
      .filter(_.add.nonEmpty).last.add.head
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/$hiRel"),
      "not parquet".getBytes)
    TxLog.readRange(spark, root, "id", 0, 100).count() shouldBe 50L
    TxLog.countRows(spark, root) shouldBe 101L
  }

  test("ANALYZE/SHOW PARTITIONS/ADD COLUMNS on unregistered tables pass through to Spark") {
    // these statements are valid Spark SQL: a catalog table must keep
    // Spark's own semantics, not hit the registry
    spark.sql("DROP TABLE IF EXISTS plaincat")
    spark.sql("CREATE TABLE plaincat (id BIGINT, p STRING) USING PARQUET PARTITIONED BY (p)")
    try {
      spark.sql("INSERT INTO plaincat VALUES (1, 'a')")
      TxLogSql.run(spark, "ANALYZE TABLE plaincat COMPUTE STATISTICS FOR COLUMNS id")
      TxLogSql.run(spark, "SHOW PARTITIONS plaincat")
        .collect().map(_.getString(0)).toSeq shouldBe Seq("p=a")
      TxLogSql.run(spark, "ALTER TABLE plaincat ADD COLUMNS (extra INT)")
      spark.table("plaincat").columns should contain("extra")
    } finally spark.sql("DROP TABLE plaincat")
  }

  test("SHOW PARTITIONS answers from the log; unpartitioned tables are refused") {
    freshTable("show_parts")
    TxLogSql.run(spark, "SHOW PARTITIONS show_parts")
      .as[String].collect().toSeq shouldBe Seq("part=p1", "part=p2")
    val root = Files.createTempDirectory("graft-noparts").toString
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "s"), root)
    TxLogSql.register(spark, "show_noparts", root)
    val err = intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "SHOW PARTITIONS show_noparts")
    }
    err.getMessage should include("not partitioned")
  }

  test("ALTER COLUMN TYPE up-casts metadata-only; non-up-casts are refused") {
    val root = Files.createTempDirectory("graft-altype").toString
    TxLog.append(spark,
      (1 to 5).map(k => (k.toLong, k)).toDF("id", "n")
        .select(col("id"), col("n").cast("int").as("n"))
        .repartition(1), root)
    TxLogSql.register(spark, "altype_t", root)
    // a narrow-hashed bloom index must be strictly dropped by the widen
    TxLogSql.run(spark,
      "CREATE BLOOMFILTER INDEX ON TABLE altype_t FOR COLUMNS (n)")
    val out = TxLogSql.run(spark,
      "ALTER TABLE altype_t ALTER COLUMN n TYPE BIGINT")
    out.select("operation").head().getString(0) shouldBe "alter_column_type"
    TxLog.bloomIndexColumns(spark, root) shouldBe empty
    // the refreshed view reads the NARROW physical files under the wide
    // schema (SPARK-40876) and accepts a wide batch
    spark.table("altype_t").schema("n").dataType shouldBe
      org.apache.spark.sql.types.LongType
    spark.sql("SELECT sum(n) FROM altype_t").head().getLong(0) shouldBe 15L
    TxLog.append(spark,
      Seq((6L, 3000000000L)).toDF("id", "n").repartition(1), root)
    TxLog.readLatest(spark, root).agg(max("n")).head()
      .getLong(0) shouldBe 3000000000L
    // narrowing and cross-family changes are refused; SET DATA TYPE
    // spelling and the no-op both work
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ALTER TABLE altype_t ALTER COLUMN n TYPE INT")
    }.getMessage should include("up-cast")
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark,
        "ALTER TABLE altype_t ALTER COLUMN n SET DATA TYPE STRING")
    }.getMessage should include("up-cast")
    // long -> double is deliberately NOT a widening (mantissa loss)
    intercept[IllegalArgumentException] {
      TxLogSql.run(spark, "ALTER TABLE altype_t ALTER COLUMN n TYPE DOUBLE")
    }
    val vNoop = TxLog.alterColumnType(spark, root, "n", "BIGINT")
    vNoop shouldBe TxLog.latestVersion(spark, root).get
  }

  test("ALTER COLUMN TYPE on a renamed column widens through the mapping") {
    val root = Files.createTempDirectory("graft-altype2").toString
    TxLog.append(spark,
      (1 to 4).map(k => (k.toLong, k.toFloat)).toDF("id", "amt")
        .select(col("id"), col("amt").cast("float").as("amt"))
        .repartition(1), root)
    TxLog.renameColumn(spark, root, "amt", "amount")
    TxLog.alterColumnType(spark, root, "amount", "DOUBLE")
    val t = TxLog.readLatest(spark, root)
    t.schema("amount").dataType shouldBe
      org.apache.spark.sql.types.DoubleType
    t.agg(sum("amount")).head().getDouble(0) shouldBe 10.0
  }

  test("REPAIR LOG quarantines a dead tail claim and unwedges the table") {
    val root = freshTable("repair_t")
    TxLogSql.execute(spark, "INSERT INTO repair_t SELECT CAST(5 AS BIGINT), 'e', 2.5, 'p1'")
    // a writer died between its claim and its bytes landing: the tail
    // entry exists but is torn mid-JSON
    val logDir = new java.io.File(s"$root/${TxLog.LogDirName}")
    val last = logDir.listFiles()
      .filter(_.getName.matches("\\d{20}\\.json")).map(_.getName).max
    val dead = new java.io.File(logDir, f"${last.take(20).toLong + 1}%020d.json")
    Files.write(dead.toPath, """{"version":2,"operation":"app""".getBytes)
    // fresh tail: may be a healthy in-flight commit — refused by the
    // safety age...
    intercept[java.io.IOException] {
      TxLogSql.run(spark, "REPAIR LOG repair_t")
    }.getMessage should include("only")
    // ...but reads keep working meanwhile (in-flight tails are invisible)
    spark.sql("SELECT count(*) FROM repair_t").head().getLong(0) shouldBe 5L
    // dry run previews, quarantine frees the version, the orphan stays
    TxLogSql.run(spark, "REPAIR LOG repair_t OLDER THAN 0 SECONDS DRY RUN")
      .collect().map(_.getString(0)).toSeq shouldBe Seq(dead.getName)
    dead.exists() shouldBe true
    TxLogSql.run(spark, "REPAIR LOG repair_t OLDER THAN 0 SECONDS")
      .collect().map(_.getString(0)).toSeq shouldBe Seq(dead.getName)
    dead.exists() shouldBe false
    new java.io.File(logDir, dead.getName + ".orphan").exists() shouldBe true
    // the table unwedges: a fresh commit claims the freed version
    TxLogSql.execute(spark, "INSERT INTO repair_t SELECT CAST(6 AS BIGINT), 'f', 3.5, 'p2'")
    TxLog.history(spark, root).last.version shouldBe
      last.take(20).toLong + 1
    spark.sql("SELECT count(*) FROM repair_t").head().getLong(0) shouldBe 6L
    // nothing to repair on a healthy log
    TxLogSql.run(spark, "REPAIR LOG repair_t OLDER THAN 0 SECONDS")
      .count() shouldBe 0L
  }

  test("REPAIR LOG refuses mid-log corruption — quarantine never drops committed history") {
    val root = freshTable("repair_mid")
    TxLogSql.execute(spark, "INSERT INTO repair_mid SELECT CAST(5 AS BIGINT), 'e', 1.0, 'p1'")
    TxLogSql.execute(spark, "INSERT INTO repair_mid SELECT CAST(6 AS BIGINT), 'f', 1.0, 'p1'")
    val logDir = new java.io.File(s"$root/${TxLog.LogDirName}")
    val mid = new java.io.File(logDir, "00000000000000000001.json")
    // corrupt a NON-tail entry (and drop the local-FS checksum sidecar
    // so the read reaches the parser)
    new java.io.File(logDir, ".00000000000000000001.json.crc").delete()
    Files.write(mid.toPath, "garbage".getBytes)
    intercept[java.io.IOException] {
      TxLogSql.run(spark, "REPAIR LOG repair_mid OLDER THAN 0 SECONDS")
    }.getMessage should include("NOT the tail")
    mid.exists() shouldBe true // untouched
  }
}

package graft.lake

import graft.SparkSpec
import java.nio.file.Files

/** Persistent CHECK constraints on the commit log: validated against all
  * existing rows at add time, enforced on every data-adding write path,
  * surviving checkpoint truncation, and exposed through the SQL surface
  * (Delta's `ALTER TABLE ... ADD CONSTRAINT` shape).
  */
class TxLogConstraintSpec extends SparkSpec {

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-cons").toString

  private def seeded(): String = {
    val root = tmpRoot()
    TxLog.append(spark,
      Seq((1L, 10.0, "p1"), (2L, 5.0, "p2")).toDF("id", "bal", "part"),
      root, Seq("part"))
    root
  }

  test("addConstraint refuses when existing rows already violate") {
    val root = seeded()
    TxLog.append(spark, Seq((3L, -1.0, "p1")).toDF("id", "bal", "part"),
      root, Seq("part"))
    val e = intercept[IllegalStateException] {
      TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    }
    e.getMessage should include("1 existing row(s)")
    TxLog.constraintsOf(spark, root) shouldBe empty
  }

  test("a violating append is refused BEFORE the commit; table state unchanged") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    val vBefore = TxLog.latestVersion(spark, root).get
    val e = intercept[IllegalStateException] {
      TxLog.append(spark, Seq((9L, -3.0, "p1")).toDF("id", "bal", "part"),
        root, Seq("part"))
    }
    e.getMessage should include("bal_nonneg")
    TxLog.latestVersion(spark, root).get shouldBe vBefore
    TxLog.readLatest(spark, root).count() shouldBe 2L
    // the refused batch's staged files are cleaned up, not orphaned
    TxLog.cleanOrphans(spark, root, olderThanMs = 0L) shouldBe empty
  }

  test("NULL satisfies CHECK (SQL semantics), and valid batches commit") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    TxLog.append(spark,
      Seq((3L, Option.empty[Double], "p2"), (4L, Some(1.5), "p1"))
        .toDF("id", "bal", "part"),
      root, Seq("part"))
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }

  test("multi-constraint violations report every broken rule in one pass") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    TxLog.addConstraint(spark, root, "id_pos", "id > 0")
    val e = intercept[IllegalStateException] {
      TxLog.append(spark,
        Seq((-7L, -1.0, "p1")).toDF("id", "bal", "part"), root, Seq("part"))
    }
    e.getMessage should include("bal_nonneg")
    e.getMessage should include("id_pos")
  }

  test("merge and UPDATE enforce; DELETE needs no check and still works") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    intercept[IllegalStateException] {
      TxLog.merge(spark,
        Seq((1L, -50.0, "p1")).toDF("id", "bal", "part"),
        root, Seq("id"), Seq("part"))
    }
    intercept[IllegalStateException] {
      TxLog.update(spark, root,
        org.apache.spark.sql.functions.col("id") === 1L,
        Map("bal" -> org.apache.spark.sql.functions.lit(-1.0)))
    }
    // survivors of a delete were already validated — no false rejection
    TxLog.delete(spark, root,
      org.apache.spark.sql.functions.col("id") === 2L)
    TxLog.readLatest(spark, root).count() shouldBe 1L
  }

  test("overwrite dropping a referenced column is refused loudly") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    val e = intercept[IllegalArgumentException] {
      TxLog.overwrite(spark, Seq((1L, "p1")).toDF("id", "part"),
        root, Seq("part"))
    }
    e.getMessage should include("bal_nonneg")
    TxLog.readLatest(spark, root).count() shouldBe 2L
  }

  test("constraints survive checkpoint truncation of the commit log") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    (0 until TxLog.CheckpointInterval).foreach { i =>
      TxLog.append(spark,
        Seq((10L + i, 1.0, "p1")).toDF("id", "bal", "part"),
        root, Seq("part"))
    }
    TxLog.checkpoint(spark, root)
    val tip = TxLog.latestVersion(spark, root).get
    // drop every pre-checkpoint commit: the constraint must now come
    // from the checkpoint alone
    (0L until tip).foreach { v =>
      new java.io.File(f"$root/${TxLog.LogDirName}/$v%020d.json").delete()
    }
    TxLog.constraintsOf(spark, root) shouldBe Map("bal_nonneg" -> "bal >= 0")
    intercept[IllegalStateException] {
      TxLog.append(spark, Seq((99L, -1.0, "p1")).toDF("id", "bal", "part"),
        root, Seq("part"))
    }
  }

  test("dropConstraint stops enforcement; duplicate add and unknown drop fail") {
    val root = seeded()
    TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 10")
    }
    intercept[IllegalArgumentException] {
      TxLog.dropConstraint(spark, root, "nope")
    }
    TxLog.dropConstraint(spark, root, "bal_nonneg")
    TxLog.append(spark, Seq((9L, -3.0, "p1")).toDF("id", "bal", "part"),
      root, Seq("part"))
    TxLog.readLatest(spark, root).count() shouldBe 3L
  }

  test("addConstraint rejects unknown or qualified column references") {
    val root = seeded()
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, root, "ghost", "no_such_col > 0")
    }
    intercept[IllegalArgumentException] {
      TxLog.addConstraint(spark, root, "qual", "t.bal > 0")
    }
  }

  test("a constraint committed between a batch's validation and its commit fails the write") {
    val root = seeded()
    // the batch validates against a constraint-free table; the hook then
    // lands bal_nonneg BEFORE the batch's commit attempt — without the
    // commit-time guard the violating rows would slip right past the
    // fresh constraint (whose own validation scan never saw them either)
    TxLog.postEnforceHook =
      () => TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    try {
      intercept[java.util.ConcurrentModificationException] {
        TxLog.append(spark,
          Seq((9L, -3.0, "p1")).toDF("id", "bal", "part"), root, Seq("part"))
      }
    } finally TxLog.postEnforceHook = () => ()
    TxLog.constraintsOf(spark, root).keySet shouldBe Set("bal_nonneg")
    TxLog.readLatest(spark, root).count() shouldBe 2L
  }

  test("the constraint fence holds when the change hides behind a cadence checkpoint") {
    val root = seeded()
    // interval=1: the injected addConstraint's commit immediately writes
    // a checkpoint AT its own version, so the append's checkpoint-bounded
    // raw tail contains NO consAdd entry — an event scan over `commits`
    // would wave the stale batch through. The fence compares the resolved
    // snapshot's constraint SET by value, which a checkpoint can never
    // hide, and must still refuse.
    spark.conf.set("spark.graft.checkpoint.interval", "1")
    TxLog.postEnforceHook =
      () => TxLog.addConstraint(spark, root, "bal_nonneg", "bal >= 0")
    try {
      intercept[java.util.ConcurrentModificationException] {
        TxLog.append(spark,
          Seq((9L, -3.0, "p1")).toDF("id", "bal", "part"), root, Seq("part"))
      }
    } finally {
      TxLog.postEnforceHook = () => ()
      spark.conf.unset("spark.graft.checkpoint.interval")
    }
    TxLog.constraintsOf(spark, root).keySet shouldBe Set("bal_nonneg")
    TxLog.readLatest(spark, root).count() shouldBe 2L
  }

  test("a constraint added and dropped back mid-flight leaves the write valid — value fence, not event scan") {
    val root = seeded()
    // net-zero rule change: the winning state's constraint set equals
    // the one the batch was validated against, so the validation still
    // holds verbatim and the write goes through (the old event scan
    // refused here for no correctness reason)
    TxLog.postEnforceHook = () => {
      TxLog.addConstraint(spark, root, "id_pos", "id > 0")
      TxLog.dropConstraint(spark, root, "id_pos")
    }
    try {
      TxLog.append(spark,
        Seq((9L, -3.0, "p1")).toDF("id", "bal", "part"), root, Seq("part"))
    } finally TxLog.postEnforceHook = () => ()
    TxLog.constraintsOf(spark, root) shouldBe empty
    TxLog.readLatest(spark, root).count() shouldBe 3L
  }

  test("SQL surface: ALTER TABLE ADD/DROP CONSTRAINT + SHOW CONSTRAINTS") {
    val root = seeded()
    TxLogSql.register(spark, "cons_sql", root, partitionCols = Seq("part"))
    TxLogSql.run(spark,
      "ALTER TABLE cons_sql ADD CONSTRAINT bal_ok CHECK (bal >= 0 AND bal < 1e9)")
    TxLogSql.run(spark, "SHOW CONSTRAINTS cons_sql")
      .as[(String, String)].collect().toSeq shouldBe
      Seq(("bal_ok", "bal >= 0 AND bal < 1e9"))
    val e = intercept[IllegalStateException] {
      TxLogSql.run(spark,
        "INSERT INTO cons_sql VALUES (7, -2.0, 'p1')")
    }
    e.getMessage should include("bal_ok")
    TxLogSql.run(spark, "ALTER TABLE cons_sql DROP CONSTRAINT bal_ok")
    TxLogSql.run(spark, "SHOW CONSTRAINTS cons_sql").count() shouldBe 0L
    TxLogSql.run(spark, "INSERT INTO cons_sql VALUES (7, -2.0, 'p1')")
    spark.sql("SELECT count(*) FROM cons_sql").head().getLong(0) shouldBe 3L
  }
}

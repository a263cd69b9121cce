package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** RENAME COLUMN via column mapping ([[TxLog.renameColumn]]): physical
  * names frozen, zero bytes rewritten, logical schema renamed in a
  * metadata-only commit. These specs pin the mapping's whole lifecycle:
  * read/write under the new name, time travel to the old one, the
  * physical-name resurrection guard, rollback/clone/overwrite
  * interactions, DML and the change feed on a mapped table, and
  * survival through checkpoint truncation.
  */
class TxLogRenameSpec extends SparkSpec {

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-rename").toString

  private def dataFileNames(root: String): Seq[String] =
    new java.io.File(root).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSeq.sorted

  test("rename is metadata-only: files untouched, reads and writes use the new name") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 10L).map(k => (k, s"s$k")).toDF("id", "payload")
        .repartition(1), root)
    val filesBefore = dataFileNames(root)
    TxLog.renameColumn(spark, root, "payload", "body")
    // zero data files touched
    dataFileNames(root) shouldBe filesBefore
    // logical schema renamed; values read through the frozen physical name
    val post = TxLog.readLatest(spark, root)
    post.columns.toSeq shouldBe Seq("id", "body")
    post.orderBy("id").select("body").head().getString(0) shouldBe "s1"
    // writes stage under the new logical name; the file carries the
    // frozen PHYSICAL name so the live set stays homogeneous
    TxLog.append(spark,
      Seq((11L, "s11")).toDF("id", "body").repartition(1), root)
    val all = TxLog.readLatest(spark, root)
    all.count() shouldBe 11L
    all.filter(col("body") === "s11").count() shouldBe 1L
    val newFile = dataFileNames(root).filterNot(filesBefore.contains)
    newFile should have size 1
    spark.read.parquet(s"$root/${newFile.head}")
      .columns.toSeq should contain("payload")
  }

  test("time travel is era-exact: pre-rename versions keep the old name") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "payload"), root) // v0
    TxLog.renameColumn(spark, root, "payload", "body")              // v1
    TxLog.readAt(spark, root, 0L).columns.toSeq shouldBe Seq("id", "payload")
    TxLog.readAt(spark, root, 0L).select("payload")
      .head().getString(0) shouldBe "a"
    TxLog.readAt(spark, root, 1L).columns.toSeq shouldBe Seq("id", "body")
  }

  test("re-adding the physical name is refused; overwrite lifts the guard and the mapping") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "payload"), root)
    TxLog.renameColumn(spark, root, "payload", "body")
    // a stale writer still carrying the old logical name: its column
    // would alias the frozen physical bytes — refused via the tombstone
    intercept[IllegalArgumentException] {
      TxLog.append(spark, Seq((2L, "x")).toDF("id", "payload"), root)
    }.getMessage should include("payload")
    intercept[IllegalArgumentException] {
      TxLog.addColumns(spark, root, Seq("Payload" -> "string"))
    }
    // OVERWRITE rewrites every file under the logical names: the
    // mapping clears, and the old name becomes a legitimate new column
    val preOw = dataFileNames(root).toSet
    TxLog.overwrite(spark, TxLog.readLatest(spark, root), root)
    val owFiles = dataFileNames(root).filterNot(preOw)
    owFiles should not be empty
    spark.read.parquet(s"$root/${owFiles.head}")
      .columns.toSeq should contain("body")
    TxLog.append(spark,
      Seq((9L, "b9", "fresh")).toDF("id", "body", "payload"), root)
    TxLog.readLatest(spark, root)
      .filter(col("payload") === "fresh").count() shouldBe 1L
  }

  test("rename chains and the un-rename: b -> c, then c back to the physical name a") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, 5.0)).toDF("id", "a"), root)
    TxLog.renameColumn(spark, root, "a", "b")
    TxLog.renameColumn(spark, root, "b", "c")
    val snap = TxLog.readLatest(spark, root)
    snap.columns.toSeq shouldBe Seq("id", "c")
    snap.select("c").head().getDouble(0) shouldBe 5.0
    // the chain-retired alias b holds NO bytes anywhere (physical is
    // a throughout), so it is NOT tombstoned: a stale b-writer's batch
    // merges b in as an ordinary new column — its values land under b,
    // never aliasing c's physical bytes
    TxLog.append(spark, Seq((2L, 1.0)).toDF("id", "b"), root)
    val merged = TxLog.readLatest(spark, root)
    merged.columns.toSeq shouldBe Seq("id", "c", "b")
    merged.filter(col("id") === 1L).select("c", "b").head()
      .toSeq shouldBe Seq(5.0, null)
    merged.filter(col("id") === 2L).select("c", "b").head()
      .toSeq shouldBe Seq(null, 1.0)
    // un-rename: back to the column's OWN physical name is allowed (its
    // tombstone clears — the bytes are the column's own current data);
    // b rides along untouched
    TxLog.renameColumn(spark, root, "c", "a")
    TxLog.readLatest(spark, root).columns.toSeq shouldBe Seq("id", "a", "b")
    TxLog.append(spark, Seq((3L, 7.0)).toDF("id", "a"), root)
    TxLog.readLatest(spark, root).agg(sum("a")).head().getDouble(0) shouldBe 12.0
    // and a SECOND rename onto the previously retired alias b is legal
    // (no bytes ever existed under it) — the fuzz's round-trip case
    TxLog.renameColumn(spark, root, "b", "b2")
    TxLog.renameColumn(spark, root, "a", "a2")
    TxLog.renameColumn(spark, root, "a2", "a")
    TxLog.readLatest(spark, root).columns.toSeq shouldBe Seq("id", "a", "b2")
  }

  test("renames are refused for partition columns, existing targets, and constrained columns") {
    val root = tmpRoot()
    TxLog.append(spark,
      Seq((1L, "x", "p1")).toDF("id", "s", "part"), root, Seq("part"))
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, root, "part", "region")
    }.getMessage should include("partition")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, root, "s", "id")
    }.getMessage should include("already exists")
    TxLog.addConstraint(spark, root, "s_nonempty", "length(s) > 0")
    intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, root, "s", "label")
    }.getMessage should include("s_nonempty")
  }

  test("DML on a mapped table: merge, DELETE, UPDATE address the logical name") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 20L).map(k => (k, k * 10.0)).toDF("id", "amt")
        .repartition(2), root)
    TxLog.renameColumn(spark, root, "amt", "amount")
    TxLog.merge(spark,
      Seq((1L, 999.0), (21L, 210.0)).toDF("id", "amount"), root,
      keyCols = Seq("id"), partitionCols = Seq.empty)
    val t = TxLog.readLatest(spark, root)
    t.count() shouldBe 21L
    t.filter(col("id") === 1L).select("amount")
      .head().getDouble(0) shouldBe 999.0
    // ids 16..20 (160..200), the merged id 1 (999), and id 21 (210)
    TxLog.delete(spark, root, col("amount") > 150.0)
    TxLog.readLatest(spark, root).count() shouldBe 14L
    TxLog.update(spark, root, col("id") === 2L,
      Map("amount" -> lit(0.0)))
    TxLog.readLatest(spark, root).filter(col("id") === 2L)
      .select("amount").head().getDouble(0) shouldBe 0.0
  }

  test("the mapping survives checkpoint truncation and rides rollback and clone") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "payload"), root) // v0
    TxLog.renameColumn(spark, root, "payload", "body")              // v1
    (0 until 10).foreach { i =>                                     // v2..v11
      TxLog.append(spark,
        Seq((10L + i, s"r$i")).toDF("id", "body").repartition(1), root)
    }
    TxLog.vacuumLog(spark, root, keepCheckpoints = 1) should not be empty
    // mapping came through the (v2 parquet) checkpoint: renamed column
    // still reads its frozen physical bytes
    val t = TxLog.readLatest(spark, root)
    t.columns.toSeq shouldBe Seq("id", "body")
    t.filter(col("id") === 1L).select("body").head().getString(0) shouldBe "a"
    // and the tombstone guard still holds post-truncation
    intercept[IllegalArgumentException] {
      TxLog.append(spark, Seq((99L, "x")).toDF("id", "payload"), root)
    }
    // clone restates the mapping on its v0
    val dst = tmpRoot() + "/clone"
    TxLog.cloneTable(spark, root, dst)
    TxLog.readLatest(spark, dst).filter(col("id") === 1L)
      .select("body").head().getString(0) shouldBe "a"
    // rollback to a pre-rename version restores the old name AND clears
    // the mapping for the restored era
    val root2 = tmpRoot()
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "payload"), root2) // v0
    TxLog.renameColumn(spark, root2, "payload", "body")              // v1
    TxLog.rollback(spark, root2, 0L)                                 // v2
    val rolled = TxLog.readLatest(spark, root2)
    rolled.columns.toSeq shouldBe Seq("id", "payload")
    rolled.select("payload").head().getString(0) shouldBe "a"
    // the restored era accepts the old name again (tombstone restated
    // from the target = empty)
    TxLog.append(spark, Seq((2L, "b")).toDF("id", "payload"), root2)
    TxLog.readLatest(spark, root2).count() shouldBe 2L
  }

  test("change feed spans a rename: pre-rename deltas under the era's physical names") {
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
      .repartition(1), root)                                        // v0
    TxLog.renameColumn(spark, root, "payload", "body")              // v1
    TxLog.append(spark, Seq((3L, "c")).toDF("id", "body")
      .repartition(1), root)                                        // v2
    TxLog.delete(spark, root, col("id") === 1L)                     // v3
    val feed = TxLog.readChanges(spark, root, fromVersion = -1L)
    feed.columns.toSeq shouldBe Seq("id", "body", "_change_type",
      "_commit_version")
    // v0's inserts surface under the RANGE-END logical name with the
    // pre-rename files' physical bytes
    feed.filter(col("_commit_version") === 0L &&
        col("_change_type") === "insert")
      .orderBy("id").select("body").collect()
      .map(_.getString(0)).toSeq shouldBe Seq("a", "b")
    // the delete's old images read through the mapping too — the feed
    // is file-granular: the straddling v0 file reports both rows as
    // deletes and the rewrite reinserts the survivor
    feed.filter(col("_change_type") === "delete")
      .orderBy("id").select("id", "body").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "a"), (2L, "b"))
    feed.filter(col("_change_type") === "insert" &&
        col("_commit_version") === 3L)
      .select("id", "body").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe Seq((2L, "b"))
  }

  test("rename strictly drops bloom sidecars under both names; batch collisions fail loudly") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 50L).map(k => (k, s"s$k")).toDF("id", "payload")
        .repartition(2), root)
    TxLog.buildBloomIndex(spark, root, "payload") should be > 0L
    TxLog.renameColumn(spark, root, "payload", "body")
    // the sidecar under the RETIRED name is gone — it could otherwise
    // lie dormant and be re-exposed narrow-hashed by a later un-rename
    TxLog.bloomIndexColumns(spark, root) shouldBe empty
    // a batch carrying BOTH the new name and the frozen physical name
    // fails with the resurrection message at stage time, not a raw
    // duplicate-column error from the parquet writer
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark,
        Seq((99L, "b", "stale")).toDF("id", "body", "payload"), root)
    }
    e.getMessage should include("physical name")
    // and nothing of that batch leaked into the table
    TxLog.readLatest(spark, root).count() shouldBe 50L
  }

  test("stats are lineage-correct: pruning survives renames and a reused alias serves the right bounds") {
    val root = tmpRoot()
    // one file per key range, bounds recorded for both columns
    TxLog.append(spark,
      (1L to 10L).map(k => (k, 1000L + k)).toDF("a", "d")
        .repartition(1), root, statsCols = Seq("a", "d"))
    TxLog.append(spark,
      (11L to 20L).map(k => (k, 1000L + k)).toDF("a", "d")
        .repartition(1), root, statsCols = Seq("a", "d"))
    // retire 'a' to 'c' via a chain, then REUSE the retired alias 'b'
    // for the OTHER lineage — the scenario where logical stats keys
    // would serve lineage-a bounds to logical-b (= physical d) reads
    TxLog.renameColumn(spark, root, "a", "b")
    TxLog.renameColumn(spark, root, "b", "c")
    TxLog.renameColumn(spark, root, "d", "b")
    TxLog.minMaxFast(spark, root, "b") shouldBe Some((1001.0, 1020.0))
    TxLog.minMaxFast(spark, root, "c") shouldBe Some((1.0, 20.0))
    TxLog.readRange(spark, root, "b", 1001.0, 1005.0).count() shouldBe 5L
    TxLog.readRange(spark, root, "c", 3.0, 4.0).count() shouldBe 2L
    // pruning proof: corrupt the SECOND file's bytes — a range read
    // confined to the first file's bounds must never open it, under
    // the POST-rename names (stats keyed by frozen physical names)
    val f2 = TxLog.history(spark, root).filter(_.operation == "append")
      .last.add.head
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/$f2"), "garbage".getBytes)
    TxLog.readRange(spark, root, "c", 1.0, 5.0).count() shouldBe 5L
    TxLog.readRange(spark, root, "b", 1001.0, 1005.0).count() shouldBe 5L
  }

  test("an OVERWRITE racing a mapped append fails the append, not the readers") {
    // the staged batch carries FROZEN physical names; if a concurrent
    // overwrite clears the mapping between stage and claim, committing
    // those files would make the renamed column read all-NULL — the
    // commit-time mapping fence must refuse instead. postEnforceHook
    // fires exactly in that window.
    val root = tmpRoot()
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "payload"), root)
    TxLog.renameColumn(spark, root, "payload", "body")
    TxLog.postEnforceHook = () => {
      TxLog.postEnforceHook = () => ()
      TxLog.overwrite(spark, Seq((0L, "ow")).toDF("id", "body"), root)
      ()
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        TxLog.append(spark, Seq((9L, "late")).toDF("id", "body"), root)
      }.getMessage should include("column mapping")
    } finally TxLog.postEnforceHook = () => ()
    // the winner's state stands; the loser's physically-stale batch
    // never became visible
    TxLog.readLatest(spark, root).as[(Long, String)].collect()
      .toSeq shouldBe Seq((0L, "ow"))
  }

  test("stats jobs on a mapped table key by logical name on both write paths") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 20L).map(k => (k, s"s$k")).toDF("id", "payload")
        .repartition(1), root, statsCols = Seq("id"))
    TxLog.renameColumn(spark, root, "id", "key")
    // append-side: staged file carries the frozen physical name; the
    // stats job must aggregate it and record bounds under 'key'
    TxLog.append(spark,
      (21L to 30L).map(k => (k, s"s$k")).toDF("key", "payload")
        .repartition(1), root, statsCols = Seq("key"))
    TxLog.countRows(spark, root) shouldBe 30L // metadata-only row counts
    TxLog.readRange(spark, root, "key", 25.0, 27.0)
      .count() shouldBe 3L
    // overwrite-side: staged under LOGICAL names with the mapping
    // cleared — the stats job must read the logical name, not the old
    // physical one
    TxLog.overwrite(spark, TxLog.readLatest(spark, root), root,
      statsCols = Seq("key"))
    TxLog.countRows(spark, root) shouldBe 30L
    TxLog.readRange(spark, root, "key", 1.0, 5.0).count() shouldBe 5L
  }

  test("SQL lifecycle: ALTER TABLE ... RENAME COLUMN through TxLogSql") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 6L).map(k => (k, s"v$k")).toDF("id", "payload"), root)
    TxLogSql.register(spark, "rename_sql_t", root)
    val out = TxLogSql.run(spark,
      "ALTER TABLE rename_sql_t RENAME COLUMN payload TO body")
    out.select("operation").head().getString(0) shouldBe "rename_column"
    // the refreshed view exposes the new name immediately
    spark.sql("SELECT body FROM rename_sql_t WHERE id = 1")
      .head().getString(0) shouldBe "v1"
    TxLogSql.run(spark,
      "INSERT INTO rename_sql_t VALUES (7, 'v7')")
    spark.sql("SELECT count(*) FROM rename_sql_t").head().getLong(0) shouldBe 7L
    // DESCRIBE HISTORY surfaces the rename operation; DESCRIBE DETAIL
    // surfaces the live logical->physical mapping
    TxLogSql.run(spark, "DESCRIBE HISTORY rename_sql_t")
      .select("operation").collect().map(_.getString(0)) should contain("rename_column")
    TxLogSql.run(spark, "DESCRIBE DETAIL rename_sql_t")
      .select("column_mapping").head().getString(0) shouldBe "body->payload"
  }

  test("a mapped table whose log lost its origin FAILS writes — never stages under an empty mapping") {
    val root = tmpRoot()
    TxLog.append(spark,
      (1L to 5L).map(k => (k, s"s$k")).toDF("id", "payload")
        .repartition(1), root)
    TxLog.renameColumn(spark, root, "payload", "body")
    TxLog.append(spark, Seq((6L, "s6")).toDF("id", "body"), root)
    // interrupted hand-truncation: origin entry gone, no checkpoint.
    // resolve refuses — and the WRITE paths must propagate that refusal
    // instead of treating it as "fresh table, empty mapping": staging a
    // batch under logical names against a mapped table's files would be
    // fail-open on exactly the corruption the guard detects.
    new java.io.File(s"$root/${TxLog.LogDirName}/00000000000000000000.json")
      .delete() shouldBe true
    val e = intercept[IllegalArgumentException] {
      TxLog.append(spark, Seq((7L, "s7")).toDF("id", "body"), root)
    }
    e.getMessage should include("origin entries are missing")
  }
}

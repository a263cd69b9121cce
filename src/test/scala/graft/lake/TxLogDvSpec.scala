package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Deletion vectors: positional deletes without file rewrites
  * (TxLog.deleteVectored + the DV-aware read/maintenance paths).
  */
class TxLogDvSpec extends SparkSpec {

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-txdv").toString

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
    (4L, "d", 40.0), (5L, "e", 50.0), (6L, "f", 60.0)
  ).toDF("id", "s", "v")

  test("deleteVectored removes rows without touching data files; result matches rewrite delete") {
    val rootDv = tmpRoot(); val rootRw = tmpRoot()
    TxLog.append(spark, base, rootDv)
    TxLog.append(spark, base, rootRw)
    val filesBefore = TxLog.liveSizes(spark, rootDv).toMap

    TxLog.deleteVectored(spark, rootDv, col("id") % 2 === 0)
    TxLog.delete(spark, rootRw, col("id") % 2 === 0)

    // identical visible rows through both mechanisms
    val got = TxLog.readLatest(spark, rootDv).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    val want = TxLog.readLatest(spark, rootRw).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    got shouldBe want
    got.map(_._1) shouldBe Seq(1L, 3L, 5L)

    // the vector path left every data file byte-identical in place;
    // vectors exist only on the files that actually held a match
    TxLog.liveSizes(spark, rootDv).toMap shouldBe filesBefore
    val (nDv, nRows) = TxLog.dvSummary(spark, rootDv)
    nDv should be >= 1L
    nRows shouldBe 3L
  }

  test("time travel: pre-delete version still shows the deleted rows") {
    val root = tmpRoot()
    val v0 = TxLog.append(spark, base, root)
    val v1 = TxLog.deleteVectored(spark, root, col("id") <= 2)
    v1 shouldBe v0 + 1
    TxLog.readAt(spark, root, v0).count() shouldBe 6L
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }

  test("vectors are cumulative per file: a second delete unions, null predicate rows survive") {
    val root = tmpRoot()
    TxLog.append(spark, base
      .withColumn("maybe", when(col("id") === 5, lit(null: String))
        .otherwise(col("s"))), root)
    TxLog.deleteVectored(spark, root, col("id") === 1)
    // predicate is NULL for id=5 (maybe IS NULL): SQL DELETE keeps it
    TxLog.deleteVectored(spark, root, col("maybe") >= "d" && col("id") >= 4)
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id").as[Long].collect().toSeq shouldBe Seq(2L, 3L, 5L)
    TxLog.dvSummary(spark, root)._2 shouldBe 3L
  }

  test("metadata-only countRows subtracts vector rows; minMaxFast falls back") {
    val root = tmpRoot()
    TxLog.append(spark, base, root, statsCols = Seq("v"))
    TxLog.countRows(spark, root) shouldBe 6L
    TxLog.minMaxFast(spark, root, "v") shouldBe Some((10.0, 60.0))
    TxLog.deleteVectored(spark, root, col("v") >= 50.0)
    TxLog.countRows(spark, root) shouldBe 4L
    // stats would still claim max=60 — the fast path must decline
    TxLog.minMaxFast(spark, root, "v") shouldBe None
    // ...unless a VECTOR-FREE file dominates both bounds: append an
    // edge file spanning the survivors' range and the answer is exact
    // from metadata again (clean-dominates — the dirty files' true
    // extremes can only have moved inward of their stats)
    TxLog.append(spark,
      Seq((100L, "lo", 5.0), (101L, "hi", 70.0)).toDF("id", "s", "v")
        .repartition(1), root, statsCols = Seq("v"))
    TxLog.minMaxFast(spark, root, "v") shouldBe Some((5.0, 70.0))
  }

  test("vector-deleted rows never resurrect through UPDATE or MERGE rewrites") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id") === 2)
    // UPDATE rewrites the file containing id=3 — id=2 lives in the same
    // file set and must stay gone
    TxLog.update(spark, root, col("id") === 3, Map("v" -> lit(99.0)))
    val after = TxLog.readLatest(spark, root).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    after.map(_._1) shouldBe Seq(1L, 3L, 4L, 5L, 6L)
    after.find(_._1 == 3L).map(_._3) shouldBe Some(99.0)
    // merge an upsert for id=4: survivors of its file must exclude id=2
    TxLog.deleteVectored(spark, root, col("id") === 1)
    TxLog.merge(spark, Seq((4L, "D", 44.0)).toDF("id", "s", "v"),
      root, Seq("id"), Seq.empty)
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L, 5L, 6L)
  }

  test("OPTIMIZE materializes vectors: rows stay gone, dv count drops to zero") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id").isin(2L, 4L))
    TxLog.dvSummary(spark, root)._2 shouldBe 2L
    TxLog.compact(spark, root)
    TxLog.dvSummary(spark, root) shouldBe ((0L, 0L))
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(1L, 3L, 5L, 6L)
  }

  test("rollback restores the dv state of the target version") {
    val root = tmpRoot()
    val v0 = TxLog.append(spark, base, root)
    val v1 = TxLog.deleteVectored(spark, root, col("id") === 1)
    TxLog.deleteVectored(spark, root, col("id") === 3)
    TxLog.readLatest(spark, root).count() shouldBe 4L
    // back to "only id=1 deleted"
    TxLog.rollback(spark, root, v1)
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(2L, 3L, 4L, 5L, 6L)
    // back to "nothing deleted"
    TxLog.rollback(spark, root, v0)
    TxLog.readLatest(spark, root).count() shouldBe 6L
  }

  test("checkpoint persists vectors; partitioned tables with escaped values work end-to-end") {
    val root = tmpRoot()
    // partition values with a space and a Hive-escaped '=' exercise the
    // URI-encoding of _metadata.file_path against the log's decoded form
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "c=d"), (4L, "c=d"))
      .toDF("id", "p")
    TxLog.append(spark, df, root, partitionCols = Seq("p"))
    TxLog.deleteVectored(spark, root, col("id").isin(1L, 3L))
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id", "p").as[(Long, String)].collect()
      .toSeq shouldBe Seq((2L, "a b"), (4L, "c=d"))
    // checkpoint + more commits, then read through the checkpoint
    TxLog.checkpoint(spark, root)
    TxLog.append(spark, Seq((5L, "a b")).toDF("id", "p"), root, Seq("p"))
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(2L, 4L, 5L)
  }

  test("CDC feed: delete_dv emits exactly the newly deleted rows; removed DV'd files don't re-emit them") {
    val root = tmpRoot()
    val v0 = TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id") === 2)
    TxLog.deleteVectored(spark, root, col("id") === 4)
    val ch = TxLog.readChanges(spark, root, fromVersion = v0)
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq.sorted
    ch shouldBe Seq((2L, "delete", v0 + 1), (4L, "delete", v0 + 2))
    // compact is a row-preserving relayout: the feed SKIPS it entirely
    // (Delta CDF's dataChange=false rule) — every surviving row is
    // carried into the packed files unchanged, and the vector-deleted
    // ids' deletes were already emitted by the delete_dv commits above.
    // Without the skip a nightly OPTIMIZE re-emits the whole table to
    // every incremental consumer.
    val vc = TxLog.compact(spark, root)
    TxLog.readChanges(spark, root, fromVersion = vc - 1,
      toVersion = Some(vc)).count() shouldBe 0L
  }

  test("CDC feed skips relayouts; vacuumed relayout inputs never block the feed") {
    val root = tmpRoot()
    // two fragmented appends, then the relayouts: a whole-table cluster
    // (Z-order's commit shape) and a compact — both row-preserving
    TxLog.append(spark, base.filter(col("id") <= 3).repartition(2), root)
    TxLog.append(spark, base.filter(col("id") > 3).repartition(2), root)
    val vPre = TxLog.currentVersion(spark, root).get
    TxLog.cluster(spark, root, "id", 1)
    TxLog.compact(spark, root)
    val vPost = TxLog.currentVersion(spark, root).get
    // real changes AFTER the relayouts
    TxLog.append(spark, Seq((9L, "z", 90.0)).toDF("id", "s", "v"), root)
    TxLog.deleteVectored(spark, root, col("id") === 1L)
    // the feed across the whole range emits ONLY the real changes —
    // no delete+insert echo of the 6 relaid-out rows
    val ch = TxLog.readChanges(spark, root, fromVersion = vPre)
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
      .sorted
    ch shouldBe Seq((1L, "delete"), (9L, "insert"))
    // reclaim the pre-relayout files: the feed spanning the relayout
    // commits never reads them, so the vacuum guard must not refuse
    TxLog.vacuum(spark, root, keepLast = 2)
    TxLog.readChanges(spark, root, fromVersion = vPost)
      .select("id", "_change_type").as[(Long, String)].collect().toSeq
      .sorted shouldBe Seq((1L, "delete"), (9L, "insert"))
  }

  test("CDC feed fails loudly when the GROW path's pre-range sidecar was vacuumed") {
    val root = tmpRoot()
    // one data file so the second delete GROWS the first delete's vector
    TxLog.append(spark, base.coalesce(1), root)
    val v1 = TxLog.deleteVectored(spark, root, col("id") === 2)
    TxLog.deleteVectored(spark, root, col("id") === 4)
    // the grow delta at v2 reads v1's (now superseded) sidecar to subtract
    // already-emitted deletes; reap it by hand, as a vacuum would
    val s1 = TxLog.history(spark, root).find(_.version == v1)
      .get.dv.valuesIterator.map(_._1).toSeq
    s1 should not be empty
    s1.foreach { rel =>
      val p = new org.apache.hadoop.fs.Path(s"$root/$rel")
      p.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(p, true) shouldBe true
    }
    val err = intercept[IllegalArgumentException] {
      TxLog.readChanges(spark, root, fromVersion = v1).collect()
    }
    err.getMessage should include("needs vacuumed")
  }

  test("clone carries vectors; vacuum reaps superseded sidecars but keeps live ones") {
    val root = tmpRoot()
    // one data file, so the second delete's cumulative sidecar supersedes
    // the first one's on the SAME file
    TxLog.append(spark, base.repartition(1), root)
    TxLog.deleteVectored(spark, root, col("id") === 1) // sidecar A (superseded)
    TxLog.deleteVectored(spark, root, col("id") === 2) // sidecar B (cumulative)
    val dst = tmpRoot() + "/clone"
    TxLog.cloneTable(spark, root, dst)
    TxLog.readLatest(spark, dst).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L, 5L, 6L)
    // clone is independent: vacuuming the source does not break it
    val gone = TxLog.vacuum(spark, root, keepLast = 1)
    gone.count(_.startsWith(s"${TxLog.LogDirName}/dv/")) shouldBe 1
    TxLog.readLatest(spark, root).count() shouldBe 4L
    TxLog.readLatest(spark, dst).count() shouldBe 4L
  }

  test("replaceWhere and bloom index work on a DV'd table (no resurrect, no false negative)") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id") === 3)
    // predicate-scoped overwrite on files also holding the deleted row:
    // survivors must not include id=3
    TxLog.replaceWhere(spark,
      Seq((6L, "F", 66.0)).toDF("id", "s", "v"), root, col("id") >= 6)
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id", "s").as[(Long, String)].collect()
      .toSeq shouldBe Seq((1L, "a"), (2L, "b"), (4L, "d"), (5L, "e"), (6L, "F"))
    // bloom index builds over the DV-filtered scan and still finds
    // every visible key
    TxLog.buildBloomIndex(spark, root, "id", expectedKeysPerFile = 100L)
    TxLog.readEquals(spark, root, "id", Seq(4L, 6L)).orderBy("id")
      .select("id").as[Long].collect().toSeq shouldBe Seq(4L, 6L)
  }

  test("bloom index has no false negatives after a rollback resurrects vector-deleted rows") {
    val root = tmpRoot()
    val v0 = TxLog.append(spark, base.repartition(1), root)
    TxLog.deleteVectored(spark, root, col("id") === 3)
    // index built while id=3 is vector-deleted — its bits must still
    // cover the row, or the rollback below silently loses it
    TxLog.buildBloomIndex(spark, root, "id", expectedKeysPerFile = 100L)
    TxLog.rollback(spark, root, v0)
    TxLog.readEquals(spark, root, "id", Seq(3L))
      .select("id").as[Long].collect().toSeq shouldBe Seq(3L)
  }

  test("CDC feed: rollback shrinking a live file's vector emits the resurrected rows as inserts") {
    val root = tmpRoot()
    val v0 = TxLog.append(spark, base.repartition(1), root)
    val v1 = TxLog.deleteVectored(spark, root, col("id") === 2)
    val v2 = TxLog.deleteVectored(spark, root, col("id") === 4)
    val v3 = TxLog.rollback(spark, root, v1)
    TxLog.readChanges(spark, root, fromVersion = v2, toVersion = Some(v3))
      .select("id", "_change_type").as[(Long, String)].collect()
      .toSeq shouldBe Seq((4L, "insert"))
    // rollback all the way to v0: the remaining vector-delete reverts too
    val v4 = TxLog.rollback(spark, root, v0)
    TxLog.readChanges(spark, root, fromVersion = v3, toVersion = Some(v4))
      .select("id", "_change_type").as[(Long, String)].collect()
      .toSeq shouldBe Seq((2L, "insert"))
    TxLog.readLatest(spark, root).count() shouldBe 6L
  }

  test("CDC feed: a rollback re-adding a file WITH a vector inserts only its visible rows") {
    val root = tmpRoot()
    TxLog.append(spark, base.repartition(1), root)
    val v1 = TxLog.deleteVectored(spark, root, col("id") === 2)
    val v2 = TxLog.compact(spark, root) // materializes, removes the file
    val v3 = TxLog.rollback(spark, root, v1) // re-adds file + vector
    val ch = TxLog.readChanges(spark, root, fromVersion = v2,
      toVersion = Some(v3))
    ch.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSeq
      .sorted shouldBe Seq(1L, 3L, 4L, 5L, 6L) // id=2 must NOT re-insert
  }

  test("a user column named __dv_pos is refused by the vector path, not clobbered") {
    val root = tmpRoot()
    TxLog.append(spark, base.withColumn("__dv_pos", col("id") * 10), root)
    val e = intercept[IllegalStateException] {
      TxLog.deleteVectored(spark, root, col("id") === 1)
    }
    e.getMessage should include ("__dv_pos")
  }

  test("cleanOrphans reaps a never-committed sidecar dir; committed sidecars survive") {
    val root = tmpRoot()
    TxLog.append(spark, base.repartition(1), root)
    TxLog.deleteVectored(spark, root, col("id") === 1) // committed sidecar
    // simulate a deleteVectored that crashed between sidecar write and
    // commit: an unreferenced dir under _txlog/dv
    Seq(("x", 0L)).toDF("file", "pos")
      .write.parquet(s"$root/_txlog/dv/dv_orphan")
    val gone = TxLog.cleanOrphans(spark, root, olderThanMs = -60000)
    gone should contain ("_txlog/dv/dv_orphan")
    gone.count(_.startsWith("_txlog/dv/")) shouldBe 1
    TxLog.readLatest(spark, root).count() shouldBe 5L // vector still applies
  }

  test("deleteVectored works on a checkpoint-truncated log (empty commit tail)") {
    val root = tmpRoot()
    (1 to 3).foreach(i =>
      TxLog.append(spark, Seq((i.toLong, s"s$i", i * 1.0)).toDF("id", "s", "v"), root))
    TxLog.checkpoint(spark, root)
    // truncate: drop every raw commit, keep the checkpoint
    val logDir = new java.io.File(s"$root/_txlog")
    logDir.listFiles().filter(_.getName.matches("\\d{20}\\.json"))
      .foreach(_.delete())
    TxLog.deleteVectored(spark, root, col("id") === 2)
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(1L, 3L)
  }

  test("updateVectored matches rewrite update; CDC sees delete(old)+insert(new); OPTIMIZE purges") {
    val rootV = tmpRoot(); val rootR = tmpRoot()
    TxLog.append(spark, base, rootV)
    TxLog.append(spark, base, rootR)
    val filesBefore = TxLog.liveSizes(spark, rootV).map(_._1).toSet

    val vUp = TxLog.updateVectored(spark, rootV,
      col("id") % 2 === 0, Map("v" -> (col("v") + 1000), "s" -> lit("UP")))
    TxLog.update(spark, rootR,
      col("id") % 2 === 0, Map("v" -> (col("v") + 1000), "s" -> lit("UP")))
    TxLog.readLatest(spark, rootV).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq shouldBe
      TxLog.readLatest(spark, rootR).orderBy("id")
        .as[(Long, String, Double)].collect().toSeq
    // every original file untouched; only NEW files were added
    filesBefore.subsetOf(
      TxLog.liveSizes(spark, rootV).map(_._1).toSet) shouldBe true
    // change feed: the old images delete, the new images insert, same version
    val ch = TxLog.readChanges(spark, rootV, fromVersion = vUp - 1,
      toVersion = Some(vUp))
      .select("id", "s", "_change_type").as[(Long, String, String)]
      .collect().toSeq.sorted
    ch.filter(_._3 == "delete").map(_._1) shouldBe Seq(2L, 4L, 6L)
    ch.filter(_._3 == "insert")
      .map(r => (r._1, r._2)) shouldBe Seq((2L, "UP"), (4L, "UP"), (6L, "UP"))
    // metadata count unchanged by an update; purge clears the vectors
    TxLog.countRows(spark, rootV) shouldBe 6L
    TxLog.compact(spark, rootV)
    TxLog.dvSummary(spark, rootV) shouldBe ((0L, 0L))
    TxLog.readLatest(spark, rootV).filter(col("s") === "UP")
      .count() shouldBe 3L
  }

  test("updateVectored rejects a type-changing SET before committing (no poisoned files)") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    // id is LONG; id / 2 is DOUBLE — committing the staged files under
    // the old schema would break every later read of them
    val e = intercept[IllegalArgumentException] {
      TxLog.updateVectored(spark, root, col("id") === 2,
        Map("id" -> (col("id") / 2)))
    }
    e.getMessage should include ("changes column type")
    // the refused update left no trace: same rows, no vectors
    TxLog.readLatest(spark, root).count() shouldBe 6L
    TxLog.dvSummary(spark, root) shouldBe ((0L, 0L))
  }

  test("updateVectored moves rows across partitions and chains with deleteVectored") {
    val root = tmpRoot()
    val df = Seq((1L, "p1"), (2L, "p1"), (3L, "p2")).toDF("id", "p")
    TxLog.append(spark, df, root, partitionCols = Seq("p"))
    TxLog.updateVectored(spark, root, col("id") === 2, Map("p" -> lit("p2")))
    TxLog.readLatest(spark, root).filter(col("p") === "p2")
      .select("id").as[Long].collect().toSeq.sorted shouldBe Seq(2L, 3L)
    // a later vector delete must see the updated row, not the old image
    TxLog.deleteVectored(spark, root, col("p") === "p2" && col("id") === 2)
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id", "p").as[(Long, String)].collect()
      .toSeq shouldBe Seq((1L, "p1"), (3L, "p2"))
  }

  test("a DV'd read plans a broadcast anti-join — no shuffle enters the scan path") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id") === 2)
    val plan = TxLog.readLatest(spark, root).queryExecution.executedPlan.toString
    plan should include ("BroadcastHashJoin")
    plan should include ("LeftAnti")
    plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 0
  }

  test("merge mode=vector: upserts without rewriting files, matches rewrite-merge results") {
    val rootV = tmpRoot(); val rootR = tmpRoot()
    TxLog.append(spark, base, rootV)
    TxLog.append(spark, base, rootR)
    val filesBefore = TxLog.liveSizes(spark, rootV).map(_._1).toSet
    val batch = Seq((2L, "B2", 222.0), (7L, "g", 70.0)).toDF("id", "s", "v")

    spark.conf.set("spark.graft.merge.mode", "vector")
    val vm = try TxLog.merge(spark, batch, rootV, Seq("id"), Seq.empty)
      finally spark.conf.unset("spark.graft.merge.mode")
    TxLog.merge(spark, batch, rootR, Seq("id"), Seq.empty)

    TxLog.readLatest(spark, rootV).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq shouldBe
      TxLog.readLatest(spark, rootR).orderBy("id")
        .as[(Long, String, Double)].collect().toSeq
    // no original file was rewritten — the matched key's old image is
    // vectored, not re-encoded
    filesBefore.subsetOf(
      TxLog.liveSizes(spark, rootV).map(_._1).toSet) shouldBe true
    TxLog.dvSummary(spark, rootV)._2 shouldBe 1L
    // change feed: delete(old image of id=2) + inserts (upsert + new key)
    val ch = TxLog.readChanges(spark, rootV, fromVersion = vm - 1,
      toVersion = Some(vm))
      .select("id", "s", "_change_type").as[(Long, String, String)]
      .collect().toSeq
    ch.filter(_._3 == "delete") shouldBe Seq((2L, "b", "delete"))
    ch.filter(_._3 == "insert").map(_._1).sorted shouldBe Seq(2L, 7L)
  }

  test("applyCdc under merge mode=vector nets and converges without rewrites") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    val changes = Seq(
      (1L, "a9", 19.0, "insert", 5L),  // update key 1
      (3L, "c", 30.0, "delete", 5L),   // delete key 3
      (9L, "i", 90.0, "insert", 5L)    // new key 9
    ).toDF("id", "s", "v", "_change_type", "_commit_version")
    spark.conf.set("spark.graft.merge.mode", "vector")
    try TxLog.applyCdc(spark, changes, root, Seq("id"))
    finally spark.conf.unset("spark.graft.merge.mode")
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id", "s").as[(Long, String)].collect().toSeq shouldBe Seq(
      (1L, "a9"), (2L, "b"), (4L, "d"), (5L, "e"), (6L, "f"), (9L, "i"))
    // both touched keys (update + delete) are vectored, no file rewritten
    TxLog.dvSummary(spark, root)._2 shouldBe 2L
  }

  test("racing vector deletes: one wins, the loser conflicts and succeeds on retry") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // looped: the lost-update window this pins was a few microseconds
    // wide (two listings straddling a concurrent commit), so a single
    // roll proves little. GRAFT_RACE_ITERS=100 for the long soak; the
    // deterministic pause-hook tests below cover both windows exactly.
    val iters = sys.env.get("GRAFT_RACE_ITERS").map(_.toInt).getOrElse(5)
    for (_ <- 1 to iters) {
      val root = tmpRoot()
      TxLog.append(spark, base.repartition(1), root)
      val gate = new java.util.concurrent.CyclicBarrier(2)
      def attempt(cond: org.apache.spark.sql.Column): Future[Boolean] = Future {
        gate.await()
        try { TxLog.deleteVectored(spark, root, cond); true }
        catch { case _: java.util.ConcurrentModificationException => false }
      }
      val (a, b) = (attempt(col("id") <= 2), attempt(col("id") >= 5))
      val results = Await.result(Future.sequence(Seq(a, b)), 120.seconds)
      // exactly one side may lose (both can win if one commits before the
      // other resolves); every loser retries cleanly against the new state
      if (!results(0)) TxLog.deleteVectored(spark, root, col("id") <= 2)
      if (!results(1)) TxLog.deleteVectored(spark, root, col("id") >= 5)
      TxLog.readLatest(spark, root).orderBy("id").select("id")
        .as[Long].collect().toSeq shouldBe Seq(3L, 4L)
      // no orphan sidecars: every dv dir on disk is referenced by a commit
      val refd = TxLog.history(spark, root)
        .flatMap(_.dv.valuesIterator.map(_._1)).toSet
      val onDisk = Option(new java.io.File(s"$root/_txlog/dv").listFiles())
        .getOrElse(Array.empty).map(f => s"_txlog/dv/${f.getName}").toSet
      onDisk shouldBe refd
    }
  }

  test("deterministic: a commit between the tail listing and the meta resolve trips the fence") {
    // the exact window behind the lost update the looped test above once
    // caught: writer B lists the raw tail (stale), writer A commits, B's
    // meta resolve then SEES A — the fence must fire on the NEWER of the
    // two reads, or B claims a fresh version and its cumulative sidecar
    // ref un-deletes A's rows
    val root = tmpRoot()
    TxLog.append(spark, base.repartition(1), root)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TxLog.commitListPause = r =>
      if (r == root && fired.compareAndSet(false, true))
        TxLog.deleteVectored(spark, root, col("id") <= 2)
    try
      intercept[java.util.ConcurrentModificationException] {
        TxLog.deleteVectored(spark, root, col("id") >= 5)
      }
    finally TxLog.commitListPause = _ => ()
    fired.get() shouldBe true
    // the interleaved winner's deletes are intact, the loser lost nothing
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L, 5L, 6L)
    // the loser's retry unions onto the winner's vector state
    TxLog.deleteVectored(spark, root, col("id") >= 5)
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L)
    // the failed attempt reaped its sidecar: disk holds only referenced dvs
    val refd = TxLog.history(spark, root)
      .flatMap(_.dv.valuesIterator.map(_._1)).toSet
    val onDisk = Option(new java.io.File(s"$root/_txlog/dv").listFiles())
      .getOrElse(Array.empty).map(f => s"_txlog/dv/${f.getName}").toSet
    onDisk shouldBe refd
  }

  test("deterministic: a commit between the fence and the claim collides on the version, then conflicts") {
    // the OTHER window: B's fence passes legitimately, A commits before
    // B's claim — B must collide on the version number (claim target =
    // max + 1 = A's version), re-list, and conflict; it must never land
    // on a fresh version above A
    val root = tmpRoot()
    TxLog.append(spark, base.repartition(1), root)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TxLog.commitClaimPause = r =>
      if (r == root && fired.compareAndSet(false, true))
        TxLog.deleteVectored(spark, root, col("id") <= 2)
    try
      intercept[java.util.ConcurrentModificationException] {
        TxLog.deleteVectored(spark, root, col("id") >= 5)
      }
    finally TxLog.commitClaimPause = _ => ()
    fired.get() shouldBe true
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L, 5L, 6L)
    TxLog.deleteVectored(spark, root, col("id") >= 5)
    TxLog.readLatest(spark, root).orderBy("id").select("id")
      .as[Long].collect().toSeq shouldBe Seq(3L, 4L)
  }

  test("deterministic: updateVectored based on a stale snapshot conflicts instead of clobbering") {
    val root = tmpRoot()
    TxLog.append(spark, base.repartition(1), root)
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    TxLog.commitListPause = r =>
      if (r == root && fired.compareAndSet(false, true))
        TxLog.deleteVectored(spark, root, col("id") <= 2)
    try
      intercept[java.util.ConcurrentModificationException] {
        TxLog.updateVectored(spark, root, col("id") >= 5,
          Map("v" -> lit(0.0)))
      }
    finally TxLog.commitListPause = _ => ()
    // winner intact; retry applies the update over the winner's state
    TxLog.readLatest(spark, root).count() shouldBe 4L
    TxLog.updateVectored(spark, root, col("id") >= 5, Map("v" -> lit(0.0)))
    TxLog.readLatest(spark, root).orderBy("id")
      .select("id", "v").as[(Long, Double)].collect().toSeq shouldBe
      Seq((3L, 30.0), (4L, 40.0), (5L, 0.0), (6L, 0.0))
  }

  test("applyCdc records the netted feed composition in the commit metrics") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    val changes = Seq(
      (1L, "a9", 19.0, "insert"), (3L, "c", 30.0, "delete")
    ).toDF("id", "s", "v", "_change_type")
    TxLog.applyCdc(spark, changes, root, Seq("id"))
    val m = TxLog.history(spark, root).last.metrics
    m("numFeedUpserts") shouldBe 1L
    m("numFeedDeletes") shouldBe 1L
  }

  test("operation metrics ride the commit and surface through DESCRIBE HISTORY") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLog.deleteVectored(spark, root, col("id").isin(1L, 2L))
    TxLog.updateVectored(spark, root, col("id") === 3, Map("v" -> lit(33.0)))
    TxLog.compact(spark, root)
    TxLogSql.register(spark, "m_t", root)
    try {
      // rewrite-mode DML records the SAME row-level keys as vector mode
      // (a metrics consumer must not read zero because of a mode conf)
      TxLog.delete(spark, root, col("id") === 4)
      TxLog.update(spark, root, col("id") >= 5, Map("v" -> lit(0.0)))
      val hist = TxLogSql.run(spark, "DESCRIBE HISTORY m_t")
        .select("operation", "operation_metrics")
        .collect()
        .map(r => r.getString(0) -> r.getMap[String, Long](1).toMap).toMap
      hist("delete_dv")("numDeletedRows") shouldBe 2L
      hist("update_dv")("numUpdatedRows") shouldBe 1L
      hist("compact")("numPackedFiles") should be >= 1L
      hist("delete")("numDeletedRows") shouldBe 1L
      hist("update")("numUpdatedRows") shouldBe 2L
    } finally TxLogSql.unregister(spark, "m_t")
  }

  test("SQL surface: DELETE routes through vectors under the conf; DESCRIBE DETAIL reports them") {
    val root = tmpRoot()
    TxLog.append(spark, base, root)
    TxLogSql.register(spark, "dv_t", root)
    try {
      spark.conf.set("spark.graft.delete.mode", "vector")
      spark.conf.set("spark.graft.update.mode", "vector")
      TxLogSql.run(spark, "DELETE FROM dv_t WHERE id IN (2, 4)")
      TxLogSql.run(spark, "SELECT id FROM dv_t ORDER BY id")
        .as[Long].collect().toSeq shouldBe Seq(1L, 3L, 5L, 6L)
      TxLogSql.run(spark, "UPDATE dv_t SET s = 'X' WHERE id = 5")
      TxLogSql.run(spark, "SELECT s FROM dv_t WHERE id = 5")
        .as[String].collect().toSeq shouldBe Seq("X")
      val det = TxLogSql.run(spark, "DESCRIBE DETAIL dv_t")
        .select("num_deletion_vectors", "deleted_row_count")
        .as[(Long, Long)].head()
      det._2 shouldBe 3L // 2 deleted + 1 old image of the updated row
      // OPTIMIZE purges; detail returns to zero
      TxLogSql.run(spark, "OPTIMIZE dv_t")
      TxLogSql.run(spark, "DESCRIBE DETAIL dv_t")
        .select("deleted_row_count").as[Long].head() shouldBe 0L
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.conf.unset("spark.graft.update.mode")
      TxLogSql.unregister(spark, "dv_t")
    }
  }
}

package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Seeded random-op fuzz over the commit log: a few dozen randomly chosen
  * appends / merges / deletes / updates / CDC batches / compactions /
  * rollbacks — plus the merge-on-read (deletion-vector) twins of
  * delete/update/merge — are applied both to the table and to an
  * in-memory model of row state; after EVERY op the table must equal
  * the model, and at the end every historical version must still
  * time-travel to its recorded model state. One test, many op interleavings — the cheap insurance
  * that op combinations nobody wrote a bespoke spec for (merge after
  * rollback after compact, ...) still compose correctly.
  */
class TxLogFuzzSpec extends SparkSpec {

  import spark.implicits._

  test("random op sequences keep table state equal to the model at every version") {
    val rnd = new scala.util.Random(7)
    val root = Files.createTempDirectory("graft-fuzz").toString
    var model = Map.empty[Long, Double]
    // model state per committed version, for the time-travel audit
    val versions = scala.collection.mutable.Map.empty[Long, Map[Long, Double]]

    def df(m: Map[Long, Double]) = m.toSeq.toDF("id", "x")
    def state(): Map[Long, Double] =
      TxLog.readLatest(spark, root).as[(Long, Double)].collect().toMap
    def record(v: Long): Unit = versions(v) = model

    // v0: initial load
    model = (1L to 10L).map(k => k -> k.toDouble).toMap
    record(TxLog.append(spark, df(model), root, statsCols = Seq("id")))

    for (step <- 1 to 35) {
      val keys = (1L to 30L).toVector
      rnd.nextInt(12) match {
        case 0 => // append fresh keys (avoid dup rows in the model)
          val fresh = keys.filter(!model.contains(_))
          if (fresh.nonEmpty) {
            val batch = rnd.shuffle(fresh).take(3)
              .map(k => k -> (step * 100 + k).toDouble).toMap
            model ++= batch
            record(TxLog.append(spark, df(batch), root, statsCols = Seq("id")))
          }
        case 1 => // merge: upsert a random slice
          val batch = rnd.shuffle(keys).take(4)
            .map(k => k -> (step * 1000 + k).toDouble).toMap
          model ++= batch
          record(TxLog.merge(spark, df(batch), root,
            keyCols = Seq("id"), partitionCols = Seq.empty))
        case 2 => // predicate delete
          val cut = rnd.nextInt(30).toLong
          val before = model
          model = model.filter { case (k, _) => k > cut }
          if (model != before)
            record(TxLog.delete(spark, root, col("id") <= cut))
        case 3 => // predicate update
          val cut = rnd.nextInt(30).toLong
          if (model.exists(_._1 >= cut)) {
            model = model.map { case (k, v) =>
              k -> (if (k >= cut) v + 0.5 else v) }
            record(TxLog.update(spark, root, col("id") >= cut,
              Map("x" -> (col("x") + 0.5))))
          }
        case 4 => // CDC batch: mixed upserts and deletes
          val ups = rnd.shuffle(keys).take(2)
            .map(k => k -> (step * 10000 + k).toDouble).toMap
          val dels = rnd.shuffle(keys.filterNot(ups.contains)).take(2)
          model = model ++ ups -- dels
          val feed = (ups.toSeq.map { case (k, v) => (k, v, "insert") } ++
            dels.map(k => (k, 0.0, "delete")))
            .toDF("id", "x", "_change_type")
          val v = TxLog.applyCdc(spark, feed, root, keyCols = Seq("id"))
          record(v)
        case 5 => // compact (no state change)
          record(TxLog.compact(spark, root, smallerThanBytes = 1L << 20))
        case 6 => // rollback to a random recorded version
          val targets = versions.keys.toSeq.sorted
          val tv = targets(rnd.nextInt(targets.size))
          model = versions(tv)
          record(TxLog.rollback(spark, root, tv))
        case 7 => // VECTOR delete (merge-on-read twin of case 2)
          val cut = rnd.nextInt(30).toLong
          val before = model
          model = model.filter { case (k, _) => k > cut }
          if (model != before)
            record(TxLog.deleteVectored(spark, root, col("id") <= cut))
        case 8 => // VECTOR update (merge-on-read twin of case 3)
          val cut = rnd.nextInt(30).toLong
          if (model.exists(_._1 >= cut)) {
            model = model.map { case (k, v) =>
              k -> (if (k >= cut) v + 0.25 else v) }
            record(TxLog.updateVectored(spark, root, col("id") >= cut,
              Map("x" -> (col("x") + 0.25))))
          }
        case 9 => // VECTOR merge (merge-on-read twin of case 1)
          val batch = rnd.shuffle(keys).take(4)
            .map(k => k -> (step * 2000 + k).toDouble).toMap
          model ++= batch
          spark.conf.set("spark.graft.merge.mode", "vector")
          try record(TxLog.merge(spark, df(batch), root,
            keyCols = Seq("id"), partitionCols = Seq.empty))
          finally spark.conf.unset("spark.graft.merge.mode")
        case 10 => // RENAME round trip: x -> x_r (mapping on), back to x
          // two metadata-only commits interleaved with everything else;
          // model values are position-read so state must be unchanged.
          // Only the un-renamed version is recorded — a later rollback
          // must never land INSIDE the pair (the other ops address 'x')
          TxLog.renameColumn(spark, root, "x", "x_r")
          record(TxLog.renameColumn(spark, root, "x_r", "x"))
        case 11 => // cluster: a whole-table relayout (op "cluster") —
          // no state change, clears the column mapping and tombstones
          // (isFullRewrite), and the change-feed replay audit below
          // must see NOTHING from it (the relayout-skip rule) while
          // time travel and rollback across it stay exact
          record(TxLog.cluster(spark, root, "x", 2))
      }
      withClue(s"after step $step: ") { state() shouldBe model }
    }

    // the whole history still time-travels to its recorded states
    versions.foreach { case (v, m) =>
      withClue(s"version $v: ") {
        TxLog.readAt(spark, root, v).as[(Long, Double)].collect()
          .toMap shouldBe m
      }
    }

    // CHANGE-FEED replay audit: folding the full feed version-by-version
    // (deletes, then inserts — a file rewrite emits its surviving rows
    // as both, which cancel under the fold) must pass through EVERY
    // recorded model state. This pins the CDC surface to the same ground
    // truth as snapshot reads and time travel across every random op
    // interleaving: a feed that skips a commit, re-emits an already-
    // vectored delete, or mis-attributes a row to the wrong version
    // breaks the fold at the first affected version.
    val feedByV = TxLog.readChanges(spark, root, -1L)
      .select("_commit_version", "_change_type", "id", "x")
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1)
    var replay = Map.empty[Long, Double]
    versions.keys.toSeq.sorted.foreach { v =>
      feedByV.get(v).foreach { rows =>
        val dels = rows.filter(_._2 == "delete").map(_._3).toSet
        val ins = rows.filter(_._2 == "insert")
          .map(r => r._3 -> r._4).toMap
        replay = (replay -- dels) ++ ins
      }
      withClue(s"change-feed replay at version $v: ") {
        replay shouldBe versions(v)
      }
    }
  }

  /** Three SEPARATE JVMs hammer one table — the claim contract is
    * cross-process (shared-nothing writers arbitrated only by the
    * store's CAS), which no in-JVM thread race can prove. `storeArg`
    * selects the claim store the children install (None = the default
    * filesystem store).
    */
  private def crossProcessAudit(storeArgFor: String => Option[String]): Unit = {
    val root = Files.createTempDirectory("graft-xproc").toString
    val storeArg = storeArgFor(root)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cp = System.getProperty("java.class.path")
    val perWriter = 4
    val writers = Seq("w0", "w1", "w2")
    val procs = writers.map { w =>
      // same --add-opens set the build gives every forked Spark JVM
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).map(p => s"--add-opens=$p=ALL-UNNAMED")
      val cmd = Seq(javaBin, "-Xmx2g", "-cp", cp) ++ addOpens ++
        Seq("graft.lake.TxLogHammer", root, w, perWriter.toString) ++
        storeArg.toSeq
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(
        Files.createTempFile(s"hammer-$w", ".log").toFile)
      w -> pb.start()
    }
    try {
      procs.foreach { case (w, p) =>
        p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
        withClue(s"writer $w exit code (see its temp log): ") {
          p.exitValue() shouldBe 0
        }
      }
    } finally procs.foreach(_._2.destroyForcibly()) // no orphan 2g JVMs

    val total = writers.size * perWriter
    // contiguous version chain 0..total-1, one commit per batch
    val versions = TxLog.history(spark, root).map(_.version)
    versions shouldBe (0L until total.toLong)
    // no lost updates: every (writer, seq) row survived
    val rows = TxLog.readLatest(spark, root)
      .as[(String, Long)].collect().toSet
    rows shouldBe writers.flatMap(w =>
      (0 until perWriter).map(s => (w, s.toLong))).toSet
  }

  test("cross-process writers: no lost updates, contiguous version chain") {
    crossProcessAudit(_ => None)
  }

  test("cross-process writers through the durable lock-file store") {
    // same audit, arbitrated by LockFileCommitStore's OS file lock
    // instead of the local-FS hard-link claim — the deployable CAS
    // reference implementation must carry the identical guarantee
    val coord = Files.createTempDirectory("graft-coord").toString
    crossProcessAudit(_ => Some(s"lockfile:$coord"))
  }

  test("cross-process writers through the object-store conditional-PUT store") {
    // three shared-nothing JVMs, arbitrated ONLY by the S3-protocol
    // conditional PUT over HTTP (the emulator plays the bucket; every
    // 5th PUT is bounced 409 like S3's documented concurrent-conditional
    // collision, so the retry-to-decision path runs under real
    // cross-process contention). The identical no-lost-update /
    // contiguous-chain audit as the local and lock-file stores.
    var em: S3Emulator = null
    try {
      crossProcessAudit { root =>
        em = new S3Emulator(root, chaosEvery = 5)
        Some(s"s3http:${em.endpoint}|$root")
      }
      em.puts should be >= 12 // every commit claim crossed the wire
      em.conflictsInjected should be >= 2
    } finally if (em != null) em.stop()
  }

  test("lock-file store: same-JVM racing claims yield exactly one winner") {
    // FileChannel.lock throws OverlappingFileLockException for
    // same-process contention — the store's per-lease monitor must turn
    // that into ordinary serialization, not an error
    val coord = Files.createTempDirectory("graft-coord-jvm").toString
    val store = new LockFileCommitStore(coord)
    val dir = Files.createTempDirectory("graft-lockclaim").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        if (store.claim(fs, p, s"writer-$i".getBytes)) wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    wins.get() shouldBe 1
    // the winner's bytes are complete and losers did not clobber them
    new String(store.read(fs, p)) should startWith("writer-")
  }

  private def derbyUrl(tag: String): String =
    s"jdbc:derby:${Files.createTempDirectory(s"graft-$tag")}/cas;create=true"

  test("jdbc store: racing same-path claims decide by the PK, exactly one winner") {
    val store = new JdbcCommitStore(derbyUrl("jdbcclaim"))
    val dir = Files.createTempDirectory("graft-jdbcp").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        if (store.claim(fs, p, s"writer-$i".getBytes)) wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    wins.get() shouldBe 1
    new String(store.read(fs, p)) should startWith("writer-")
    // a later claim of the same path loses to the surviving row
    store.claim(fs, p, "late".getBytes) shouldBe false
  }

  test("jdbc store: a failed write-through rolls the claim row back") {
    val store = new JdbcCommitStore(derbyUrl("jdbcrb"))
    val dir = Files.createTempDirectory("graft-jdbcrb").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    // wedge the write-through: the target already exists on the fs
    val out = fs.create(p, false); out.write("junk".getBytes); out.close()
    intercept[java.io.IOException] { store.claim(fs, p, "mine".getBytes) }
    // the row must be GONE, or this version is permanently wedged: after
    // the obstruction clears, a fresh claim wins
    fs.delete(p, false) shouldBe true
    store.claim(fs, p, "mine".getBytes) shouldBe true
    new String(store.read(fs, p)) shouldBe "mine"
  }

  test("jdbc store: a quarantined entry HEALS from the staged backup; a fully amputated claim is stolen") {
    val url = derbyUrl("jdbcsteal")
    val store = new JdbcCommitStore(url)
    val dir = Files.createTempDirectory("graft-jdbcsteal").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    store.claim(fs, p, "dead".getBytes) shouldBe true
    // REPAIR LOG quarantined the canonical entry (or the owner died
    // between publication and materialize): the PUBLISHED row and the
    // staged backup survive — the commit is durable, so a later claim
    // must RESTORE it and lose, never steal acknowledged history
    fs.delete(p, false) shouldBe true
    val impatient = new JdbcCommitStore(url, staleClaimMs = 0L)
    impatient.claim(fs, p, "usurper".getBytes) shouldBe false
    new String(store.read(fs, p)) shouldBe "dead" // healed back
    // operator amputation: entry AND staged backup both gone — only now
    // is the published row dead weight. Within the safety age it is
    // still refused; past it the version unwedges by steal.
    fs.delete(p, false) shouldBe true
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .filter(_.getPath.getName.endsWith(".jdbcstaged"))
      .foreach(st => fs.delete(st.getPath, false))
    store.claim(fs, p, "too-soon".getBytes) shouldBe false
    impatient.claim(fs, p, "stolen".getBytes) shouldBe true
    new String(store.read(fs, p)) shouldBe "stolen"
    // and the new owner's row defends normally (published + entry
    // present: nothing to heal, nothing to steal)
    impatient.claim(fs, p, "late".getBytes) shouldBe false
  }

  test("jdbc store: a winner paused between INSERT and staging loses cleanly to its stealer") {
    val url = derbyUrl("jdbcpause1")
    val dir = Files.createTempDirectory("graft-jdbcpause1").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    val stalled = new JdbcCommitStore(url, staleClaimMs = 0L)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val parked = new java.util.concurrent.CountDownLatch(1)
    stalled.pauseHook = phase =>
      if (phase == "inserted") { parked.countDown(); gate.await() }
    val won = new java.util.concurrent.atomic.AtomicBoolean(true)
    val w = new Thread(() =>
      won.set(stalled.claim(fs, p, "stalled-bytes".getBytes)))
    w.start()
    parked.await()
    // the winner is frozen past the (zero) safety age between its CAS
    // insert and any byte write: a stealer completes the version
    val stealer = new JdbcCommitStore(url, staleClaimMs = 0L)
    stealer.claim(fs, p, "stealer-bytes".getBytes) shouldBe true
    gate.countDown(); w.join()
    // EXACTLY one caller reports success, and the committed bytes are
    // that caller's — the resumed original maps to a lost race (its
    // publish update matched nothing), never a phantom commit
    won.get() shouldBe false
    new String(stealer.read(fs, p)) shouldBe "stealer-bytes"
  }

  test("jdbc store: a winner paused between staging and publication loses cleanly to its stealer") {
    val url = derbyUrl("jdbcpause2")
    val dir = Files.createTempDirectory("graft-jdbcpause2").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    val stalled = new JdbcCommitStore(url, staleClaimMs = 0L)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val parked = new java.util.concurrent.CountDownLatch(1)
    stalled.pauseHook = phase =>
      if (phase == "staged") { parked.countDown(); gate.await() }
    val won = new java.util.concurrent.atomic.AtomicBoolean(true)
    val w = new Thread(() =>
      won.set(stalled.claim(fs, p, "stalled-bytes".getBytes)))
    w.start()
    parked.await()
    val stealer = new JdbcCommitStore(url, staleClaimMs = 0L)
    stealer.claim(fs, p, "stealer-bytes".getBytes) shouldBe true
    gate.countDown(); w.join()
    won.get() shouldBe false
    new String(stealer.read(fs, p)) shouldBe "stealer-bytes"
    // the loser cleaned its orphan staging; the winner's backup remains
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .map(st => new String(FsCommitStore.read(fs, st.getPath)))
      .filter(_ == "stalled-bytes") shouldBe empty
  }

  test("jdbc store: a publisher CRASHED between publication and materialize is healed by the next claimer; the commit survives") {
    val url = derbyUrl("jdbccrash")
    val dir = Files.createTempDirectory("graft-jdbccrash").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
    val crasher = new JdbcCommitStore(url)
    crasher.pauseHook = phase =>
      if (phase == "published") throw new RuntimeException("simulated crash")
    // the publisher dies AFTER the atomic row publication, BEFORE the
    // canonical entry exists: its caller sees a crash, but the commit
    // decision is already durable in the row + staged bytes
    intercept[RuntimeException](crasher.claim(fs, p, "crashed-bytes".getBytes))
    fs.exists(p) shouldBe false
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
      .count(_.getPath.getName.endsWith(".jdbcstaged")) shouldBe 1
    // a later claimer observes the published row, HEALS the canonical
    // path from the staged backup, and reports its own claim lost —
    // acknowledged history is never stolen, even by an impatient store
    val healer = new JdbcCommitStore(url, staleClaimMs = 0L)
    healer.claim(fs, p, "usurper-bytes".getBytes) shouldBe false
    new String(healer.read(fs, p)) shouldBe "crashed-bytes"
  }

  test("commit loop over a jdbc store: a crash in the publication window leaves a table the NEXT writer heals and extends") {
    val root = Files.createTempDirectory("graft-jdbccrash2").toString
    val store = new JdbcCommitStore(derbyUrl("jdbccrash2"))
    CommitStore.install(root, store)
    try {
      store.pauseHook = phase =>
        if (phase == "published") throw new RuntimeException("simulated crash")
      // version 0's publisher crashes post-decision: the append call
      // fails, but version 0 IS committed (row + staged bytes durable)
      intercept[Exception](
        TxLog.append(spark, Seq(("crashed", 0L)).toDF("w", "seq"), root))
      store.pauseHook = _ => ()
      // the next writer's claim on version 0 heals the canonical entry,
      // loses, re-reads state, and lands at version 1 — nothing wedges,
      // nothing is lost
      TxLog.append(spark,
        Seq(("later", 1L)).toDF("w", "seq"), root) shouldBe 1L
      TxLog.history(spark, root).map(_.version) shouldBe Seq(0L, 1L)
      TxLog.readLatest(spark, root).as[(String, Long)].collect().toSet shouldBe
        Set(("crashed", 0L), ("later", 1L))
    } finally CommitStore.uninstall(root)
  }

  test("jdbc store: concurrent writers through the commit loop, no lost updates") {
    val root = Files.createTempDirectory("graft-jdbcfuzz").toString
    CommitStore.install(root, new JdbcCommitStore(derbyUrl("jdbcfuzz")))
    try {
      val perWriter = 4
      val writers = Seq("w0", "w1", "w2")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = writers.map { w =>
        new Thread(() => {
          try (0 until perWriter).foreach { seq =>
            TxLog.append(spark,
              Seq((w, seq.toLong)).toDF("writer", "seq"), root)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      errs shouldBe empty
      val total = writers.size * perWriter
      TxLog.history(spark, root).map(_.version) shouldBe (0L until total.toLong)
      TxLog.readLatest(spark, root).as[(String, Long)].collect().toSet shouldBe
        writers.flatMap(w => (0 until perWriter).map(s => (w, s.toLong))).toSet
    } finally CommitStore.uninstall(root)
  }

  test("concurrent op soup with vector deletes/updates: disjoint writers converge, no lost update") {
    // the merge-on-read ops in the CONCURRENT soup: each writer owns a
    // disjoint key range (so every interleaving converges to the same
    // state) and retries on conflict — exactly the contract the
    // deleteVectored/updateVectored fences promise. A lost update shows
    // up as a resurrected deleted row or a missed update.
    val root = Files.createTempDirectory("graft-dvsoup").toString
    TxLog.append(spark,
      spark.range(0, 60).selectExpr("id", "cast(id as double) as v")
        .repartition(2), root)
    def retrying(op: () => Unit): Unit = {
      var left = 30
      while (left > 0)
        try { op(); left = 0 }
        catch { case _: java.util.ConcurrentModificationException =>
          left -= 1
          if (left == 0) throw new IllegalStateException("retries exhausted")
        }
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 3).map { k =>
      val lo = 20L * k
      new Thread(() => {
        try {
          retrying(() => { TxLog.deleteVectored(spark, root,
            col("id") >= lo && col("id") < lo + 5); () })
          retrying(() => { TxLog.updateVectored(spark, root,
            col("id") >= lo + 5 && col("id") < lo + 10,
            Map("v" -> lit(-1.0))); () })
          TxLog.append(spark,
            Seq((100L + k, 0.0)).toDF("id", "v"), root)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    errs.forEach(t => fail(s"writer failed: $t", t))
    val got = TxLog.readLatest(spark, root).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    val want = (0L until 60L).flatMap { id =>
      val off = id % 20
      if (off < 5) None
      else if (off < 10) Some((id, -1.0))
      else Some((id, id.toDouble))
    } ++ Seq((100L, 0.0), (101L, 0.0), (102L, 0.0))
    got shouldBe want.sortBy(_._1)
  }
}

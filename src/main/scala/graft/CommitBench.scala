package graft

import graft.lake.{CommitStore, JdbcCommitStore, ObjectStoreCommitStore, TxLog}
import org.apache.spark.sql.SparkSession

import java.nio.file.Files

/** Multi-writer commit THROUGHPUT: commits/s through the real commit
  * loop (claim CAS, meta resolve, entry write, cadence checkpoints) at
  * 1/4/16 concurrent writers, on both commit-store shapes — the
  * filesystem store (rename-CAS, the shared-volume topology) and the
  * JDBC store on embedded Derby (the row-CAS, object-store topology) —
  * against a table pre-grown to `nFiles` live files so every commit
  * pays the REAL resolve cost of a big table, not an empty log's.
  *
  * What this measures at 100 TB: the commit path is the ingest
  * serialization point — N streaming writers land one table version
  * each per micro-batch, and the table's sustainable ingest rate IS
  * this number. Writers here are threads (Derby is in-process), but
  * every contended step — claim, resolve, publication — is the same
  * code a shared-nothing deployment runs; only the arbiter's latency
  * changes.
  *
  *   sbt "runMain graft.CommitBench [nFiles] [commitsPerPhase]"
  *
  * Prints one JSON line: commits/s per (store, writers) plus the serial
  * baseline; recorded runs live in BASELINE.md §"Metadata scale".
  */
object CommitBench {

  /** Loopback conditional-PUT arbiter for the s3http phase: create-if-
    * absent into the table directory, decided under one monitor —
    * exactly the arbiter role the real bucket owns. ~40 lines because
    * the protocol IS small; the production store under test is
    * [[ObjectStoreCommitStore]], unmodified.
    */
  private final class LocalCasHttp(backingDir: String) {
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 64)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    private val lock = new Object
    server.createContext("/", { ex =>
      try {
        val body = ex.getRequestBody.readAllBytes()
        val ok = "*" == ex.getRequestHeaders.getFirst("If-None-Match")
        if (ex.getRequestMethod != "PUT" || !ok) ex.sendResponseHeaders(400, -1)
        else {
          val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
            .map(java.net.URLDecoder.decode(_, "UTF-8"))
          val target = java.nio.file.Paths.get(backingDir, segs.drop(1): _*)
          val created = lock.synchronized {
            if (java.nio.file.Files.exists(target)) false
            else {
              java.nio.file.Files.createDirectories(target.getParent)
              val tmp = java.nio.file.Files.createTempFile(
                target.getParent, ".cas-", ".tmp")
              java.nio.file.Files.write(tmp, body)
              java.nio.file.Files.move(tmp, target,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              true
            }
          }
          ex.sendResponseHeaders(if (created) 200 else 412, -1)
        }
      } finally ex.close()
    })
    server.setExecutor(pool)
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
  }

  private def timedMs[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e6)
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    // total commits per phase is FIXED across writer counts, so every
    // phase spans the same number of versions and amortizes the same
    // number of every-10-versions cadence checkpoints — the comparison
    // is contention, not checkpoint-landing luck
    val perPhase = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ddl = "id BIGINT,ts DOUBLE,v DOUBLE"
    val rowsPerFile = 1000L

    /** Grow a fresh log to nFiles live files through the real commit
      * path (metadata-only: no data bytes — the contention under test is
      * the log tier), checkpointed so writer commits resolve O(tail).
      */
    def buildBase(root: String): Unit = {
      val nCommits = 100
      val perCommit = math.max(1, nFiles / nCommits)
      (0 until nCommits).foreach { c =>
        val adds = (0 until perCommit).map(i => f"part-$c%05d-$i%06d.parquet")
        val stats = adds.zipWithIndex.map { case (a, i) =>
          val fileNo = c.toLong * perCommit + i
          val base = fileNo * rowsPerFile
          a -> Map(
            TxLog.RowCountKey -> (rowsPerFile.toDouble, rowsPerFile.toDouble),
            "id" -> (base.toDouble, (base + rowsPerFile - 1).toDouble))
        }.toMap
        TxLog.commitMetadataOnly(spark, root, adds, stats, ddl)
      }
      TxLog.checkpoint(spark, root)
    }

    /** `writers` threads, `perPhase` single-file commits split evenly
      * among them, all through commitLoop (cadence checkpoints included
      * — they are part of the path's real steady-state cost). Returns
      * commits/s.
      */
    def phase(root: String, writers: Int): Double = {
      val each = math.max(1, perPhase / writers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val (_, ms) = timedMs {
        val threads = (0 until writers).map { w =>
          new Thread(() => {
            try (0 until each).foreach { seq =>
              val a = f"part-w$w%03d-$seq%06d-${System.nanoTime()}%d.parquet"
              TxLog.commitMetadataOnly(spark, root, Seq(a), Map(a -> Map(
                TxLog.RowCountKey ->
                  (rowsPerFile.toDouble, rowsPerFile.toDouble),
                "id" -> (-1.0, -1.0))), ddl)
            } catch { case t: Throwable => errs.add(t) }
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
      }
      if (!errs.isEmpty)
        throw new IllegalStateException(
          s"$writers-writer phase failed: ${errs.peek()}", errs.peek())
      writers.toLong * each / (ms / 1000.0)
    }

    val writerCounts = Seq(1, 4, 16)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    Seq("fs", "jdbc", "s3http").foreach { storeName =>
      val root = Files.createTempDirectory(s"graft-commitbench-$storeName")
        .toString
      var arbiter: Option[LocalCasHttp] = None
      if (storeName == "jdbc")
        CommitStore.install(root, new JdbcCommitStore(
          s"jdbc:derby:${Files.createTempDirectory("graft-cbderby")}/cas;create=true"))
      if (storeName == "s3http") {
        // conditional-PUT CAS over a loopback HTTP arbiter: the same
        // in-process stand-in role embedded Derby plays for the row-CAS
        // — the measured cost is the real store code + one HTTP round
        // trip per claim; a WAN bucket adds its latency on top
        val a = new LocalCasHttp(root)
        arbiter = Some(a)
        CommitStore.install(root, new ObjectStoreCommitStore(a.endpoint,
          mapPath = ObjectStoreCommitStore.prefixMap(root, "lake")))
      }
      try {
        val (_, buildMs) = timedMs(buildBase(root))
        results(s"${storeName}_build_sec") = buildMs / 1000.0
        writerCounts.foreach { w =>
          // two reps, second recorded: the first warms JIT + resolve
          // caches so the phases compare contention, not warm-up order
          phase(root, w)
          results(s"${storeName}_w$w") = phase(root, w)
        }
        // sanity: contiguous version chain, nothing lost under contention
        val expect = 100L + 2L * writerCounts.map(w =>
          w.toLong * math.max(1, perPhase / w)).sum
        val got = TxLog.currentVersion(spark, root).get + 1L
        require(got == expect,
          s"$storeName: expected $expect contiguous versions, got $got")
      } finally {
        if (storeName != "fs") CommitStore.uninstall(root)
        arbiter.foreach(_.stop())
      }
    }

    val fields = results.map { case (k, v) => s"""${Json.str(k)}:${
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)}""" }
    println(s"""{"metric":"commit_throughput","unit":"commits_per_sec",""" +
      s""""nFiles":$nFiles,"perPhase":$perPhase,${fields.mkString(",")}}""")
    spark.stop()
  }
}

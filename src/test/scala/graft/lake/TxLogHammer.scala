package graft.lake

import org.apache.spark.sql.SparkSession

/** Child-process writer for the CROSS-PROCESS multi-writer fuzz: appends
  * `n` one-row batches tagged (writerId, seq) to the table at `root`,
  * each through the normal optimistic commit loop, then exits 0.
  *
  * The in-JVM fuzz ([[TxLogFuzzSpec]]) races writers as threads, but the
  * claim primitive's contract is cross-PROCESS: the local-FS hard-link
  * claim (and any real CommitStore) must arbitrate writers that share no
  * JVM state at all. The spec spawns several of these under
  * ProcessBuilder and audits the table afterwards.
  */
object TxLogHammer {
  def main(args: Array[String]): Unit = {
    val (root, writerId, nStr) = args match {
      case Array(r, w, n)        => (r, w, n)
      case Array(r, w, n, store) =>
        // optional 4th arg selects the claim store, e.g.
        // "lockfile:/path/to/coord-dir" — installed for the table root
        // so the cross-process fuzz can prove a DURABLE store's CAS
        store.split(":", 2) match {
          case Array("lockfile", dir) =>
            CommitStore.install(r, new LockFileCommitStore(dir))
          case Array("s3http", spec) =>
            // "s3http:<endpoint>|<rootToStrip>" — claims go to an
            // S3-protocol conditional-PUT endpoint (the spec's emulator,
            // or any real S3-compatible store), keys relative to root
            val Array(ep, strip) = spec.split("\\|", 2)
            CommitStore.install(r, new ObjectStoreCommitStore(ep,
              mapPath = ObjectStoreCommitStore.prefixMap(strip, "lake")))
          case other => sys.error(s"unknown store spec: ${other.mkString(":")}")
        }
        (r, w, n)
    }
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"txlog-hammer-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      (0 until n).foreach { seq =>
        TxLog.append(spark, Seq((writerId, seq.toLong)).toDF("writer", "seq"),
          root)
      }
    } finally spark.stop()
  }
}

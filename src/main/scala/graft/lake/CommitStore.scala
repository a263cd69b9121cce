package graft.lake

import java.io.IOException
import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit-claim primitive behind [[TxLog]]'s optimistic concurrency,
  * extracted as a seam because the ACID guarantee is exactly as strong as
  * this one operation: whoever can make "create version file v if absent"
  * atomic owns snapshot isolation, and a store that silently CAN'T (the
  * S3-class object stores — last-writer-wins PUT, no compare-and-swap on
  * a key) must be told so loudly rather than losing racing commits.
  *
  * The split mirrors the LogStore / commit-coordinator seam every
  * log-based table format grew for the same reason: data files and
  * derived state (checkpoints, DV sidecars, bloom indexes) go to the
  * plain filesystem — they are written once under names only a committed
  * log entry references, so they need no atomicity — while the LOG ENTRY
  * claim, and the reads/listings that recover log state, go through the
  * store. A deployment whose lake lives on an object store implements
  * this trait against an external CAS (a DynamoDB-style coordinator
  * table, a database row, a ZK node) and installs it with
  * [[CommitStore.install]]; everything above the seam is unchanged.
  */
trait CommitStore {

  /** Atomically create `p` with `bytes` iff absent; false on a lost race.
    * MUST be a real compare-and-swap: two concurrent claims of the same
    * path must never both return true.
    */
  def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean

  /** Full contents of log entry `p`. */
  def read(fs: FileSystem, p: Path): Array[Byte]

  /** Entries of the log directory `dir` (empty when absent). */
  def list(fs: FileSystem, dir: Path): Seq[Path]
}

/** Default store: the data filesystem itself supplies the atomic
  * create-if-absent.
  *
  *  - `file:` — Hadoop's local create(overwrite=false) is check-then-
  *    create, NOT atomic (two racing writers can both "win"; caught by
  *    the concurrent-append spec under load), so the claim is a POSIX
  *    hard link of a fully-written hidden temp: O(1), atomic, fails if
  *    the target exists, and the commit is content-complete the instant
  *    it becomes visible.
  *  - HDFS-family schemes — create(overwrite=false) is an atomic
  *    namespace operation and is used directly; there the visible-
  *    before-written window exists, which [[TxLog]]'s in-flight-tail
  *    handling covers.
  *  - `s3` / `s3a` — delegated to an [[ObjectStoreCommitStore]] built
  *    from the filesystem's own S3A configuration (endpoint, region,
  *    credentials, addressing style): S3 supports conditional writes
  *    (`If-None-Match: *` PUT) natively since 2024, so the bucket that
  *    holds the lake arbitrates its own commits — no shared volume, no
  *    RDBMS. One store per filesystem, memoized. An explicitly
  *    installed store for the root still wins (CommitStore.forPath
  *    routes before this claim ever runs).
  *  - Anything else (gs/...) — REFUSED. Plain create on a CAS-less
  *    object-store connector would turn every version race into a
  *    silently lost commit; the error tells the operator to install a
  *    CAS-backed [[CommitStore]] instead.
  */
object FsCommitStore extends CommitStore {

  /** Schemes whose create(overwrite=false) is an atomic namespace op. */
  private val AtomicCreateSchemes =
    Set("hdfs", "viewfs", "webhdfs", "abfs", "abfss", "ofs", "o3fs")

  // one conditional-PUT store per S3 filesystem URI (endpoint/creds are
  // per-filesystem configuration; the HttpClient inside is reusable)
  private val s3Stores =
    new ConcurrentHashMap[String, ObjectStoreCommitStore]()

  override def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    fs.getUri.getScheme match {
      case "file" =>
        val tmp = new Path(p.getParent,
          s".${p.getName}.${UUID.randomUUID().toString.take(8)}.tmp")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        } finally fs.delete(tmp, false)
      case s if AtomicCreateSchemes(s) =>
        try {
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: IOException => false }
      case "s3" | "s3a" | "s3n" =>
        s3Stores.computeIfAbsent(fs.getUri.toString,
          _ => ObjectStoreCommitStore.fromHadoopConf(fs))
          .claim(fs, p, bytes)
      case s =>
        throw new UnsupportedOperationException(
          s"filesystem scheme '$s' has no atomic create-if-absent: a " +
            s"commit claim through it could silently lose a racing " +
            s"writer's commit. Install a CAS-backed CommitStore for this " +
            s"table root (CommitStore.install) — ObjectStoreCommitStore " +
            s"(conditional-PUT CAS) for S3-compatible stores, " +
            s"ObjectStoreCommitStore.gcsInterop (HMAC keys + " +
            s"x-goog-if-generation-match) for Google Cloud Storage, " +
            s"JdbcCommitStore for a shared RDBMS, LockFileCommitStore " +
            s"for a shared POSIX volume.")
    }

  override def read(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  override def list(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath)
}

object CommitStore {

  // longest-prefix match on the table root so one JVM can serve tables on
  // mixed stores (a local scratch table next to an object-store lake)
  private val byPrefix = new ConcurrentHashMap[String, CommitStore]()

  /** Route every log-entry claim/read/list under `rootPrefix` through
    * `store`. Matched against the path string and its URI path at
    * path-COMPONENT granularity (so `/lake/t1` never captures
    * `/lake/t10`), longest prefix wins.
    */
  def install(rootPrefix: String, store: CommitStore): Unit =
    byPrefix.put(rootPrefix.replaceAll("/+$", ""), store)

  def uninstall(rootPrefix: String): Unit =
    byPrefix.remove(rootPrefix.replaceAll("/+$", ""))

  def forPath(p: Path): CommitStore = {
    if (byPrefix.isEmpty) return FsCommitStore
    val s = p.toString
    val u = p.toUri.getPath
    def covers(prefix: String, path: String): Boolean =
      path == prefix || path.startsWith(prefix + "/")
    var best: CommitStore = FsCommitStore
    var bestLen = -1
    byPrefix.forEach { (prefix, store) =>
      if ((covers(prefix, s) || (u != null && covers(prefix, u))) &&
          prefix.length > bestLen) {
        best = store; bestLen = prefix.length
      }
    }
    best
  }
}

/** In-memory compare-and-swap standing in for an external commit
  * coordinator: the claim races are decided by `putIfAbsent` on a shared
  * map (a genuine CAS), and the WINNER then writes the entry through to
  * the filesystem — single writer, so the plain create can't race.
  * Reads/listings stay on the filesystem, where the winner's
  * write-through put them. This is exactly the shape of a
  * DynamoDB-style S3 commit coordinator, scoped to one JVM — which makes
  * it both the test double proving the seam carries the guarantee and
  * the template for a real object-store implementation.
  */
final class CasOverlayCommitStore extends CommitStore {

  private val claimed = new ConcurrentHashMap[String, Boolean]()

  override def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = {
    val key = p.toUri.getPath
    if (claimed.putIfAbsent(key, true) != null) false
    else {
      // won the CAS: write through (plain create is safe — single
      // writer). If the write-through FAILS the claim must be ROLLED
      // BACK, or the version is permanently wedged: no entry exists,
      // yet every later claimer loses the CAS and retries to death.
      try {
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case t: Throwable => claimed.remove(key); throw t
      }
    }
  }

  override def read(fs: FileSystem, p: Path): Array[Byte] =
    FsCommitStore.read(fs, p)

  override def list(fs: FileSystem, dir: Path): Seq[Path] =
    FsCommitStore.list(fs, dir)

  def claimCount: Int = claimed.size()
}

/** DURABLE cross-process CAS commit store: claims are serialized by an
  * exclusive OS file lock on a per-table lease file under `lockDir`, and
  * check-if-absent + write-through run inside the critical section — a
  * deployable reference implementation of the [[CommitStore]] seam (the
  * in-memory [[CasOverlayCommitStore]] proves the seam; this one
  * survives process death and arbitrates writers that share nothing but
  * the lock directory).
  *
  * Correctness requirements on `lockDir`: it must live on a filesystem
  * whose `FileChannel.lock` provides real inter-process mutual
  * exclusion — local disks and NFSv4 do; do NOT point it at an object
  * store mount. The DATA may still live anywhere (that is the point:
  * the table root can be an object store while the tiny lease files sit
  * on a coordinator volume every writer mounts). Within one JVM, claims
  * on the same lease additionally serialize on a monitor —
  * `FileChannel.lock` throws `OverlappingFileLockException` for
  * same-process contention rather than blocking.
  *
  * Liveness: the OS releases a crashed holder's lock automatically
  * (kernel-owned state, not a lease file that can go stale), so there is
  * no lock-timeout machinery to get wrong. A writer that dies between
  * claim and durability leaves the standard in-flight tail, which
  * TxLog's tail handling already covers.
  *
  * Install: `CommitStore.install(tableRootPrefix,
  * new LockFileCommitStore(coordDir))`.
  */
final class LockFileCommitStore(lockDir: String) extends CommitStore {

  // JVM-GLOBAL (companion), keyed by lease path: OS file locks are
  // per-process, so same-JVM contention must serialize on a shared
  // monitor even when it arrives through DIFFERENT store instances
  // pointed at the same coordinator directory — per-instance maps would
  // let two instances race straight into OverlappingFileLockException
  // out of claim(), aborting a write that should simply lose the race
  private def monitors = LockFileCommitStore.monitors

  /** One lease file per LOG DIRECTORY: claims on one table serialize,
    * tables stay independent. Name = sanitized parent path + a hash
    * suffix (collisions after sanitizing would only over-serialize,
    * but the hash makes even that vanishingly unlikely).
    */
  private def leaseFor(p: Path): java.nio.file.Path = {
    val parent = p.getParent.toUri.toString
    val safe = parent.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)
    java.nio.file.Paths.get(lockDir,
      f"$safe-${parent.hashCode}%08x.lock")
  }

  override def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(lockDir))
    val lease = leaseFor(p)
    val mon = monitors.computeIfAbsent(lease.toString, _ => new Object)
    mon.synchronized {
      val ch = java.nio.channels.FileChannel.open(lease,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lk = ch.lock() // blocks until the cross-process lock is ours
        try {
          if (fs.exists(p)) false
          else {
            // single writer inside the lock, and the entry is PUBLISHED
            // BY ATOMIC RENAME of a fully-written temp: a writer that
            // crashes mid-write leaves only an invisible temp (reaped as
            // an ordinary orphan), never a torn tail entry readers and
            // REPAIR LOG would have to adjudicate. A loser never sees a
            // missing file for a version it lost to — content is in
            // place before the lock releases.
            val tmp = new Path(p.getParent, s".${p.getName}.${
              UUID.randomUUID().toString.take(8)}.claimtmp")
            val out = fs.create(tmp, true)
            try { try out.write(bytes) finally out.close() }
            catch { case t: Throwable =>
              try { fs.delete(tmp, false); () }
              catch { case _: IOException => () }
              throw t
            }
            if (!fs.rename(tmp, p)) {
              try { fs.delete(tmp, false); () }
              catch { case _: IOException => () }
              throw new IOException(s"claim publish rename $tmp -> $p failed")
            }
            true
          }
        } finally lk.release()
      } finally ch.close()
    }
  }

  override def read(fs: FileSystem, p: Path): Array[Byte] =
    FsCommitStore.read(fs, p)

  override def list(fs: FileSystem, dir: Path): Seq[Path] =
    FsCommitStore.list(fs, dir)
}

object LockFileCommitStore {
  private val monitors = new ConcurrentHashMap[String, Object]()
}

/** CAS commit store backed by a DATABASE ROW: claim = `INSERT` into a
  * table with a `(log_dir, entry)` primary key — the database's
  * uniqueness enforcement IS the compare-and-swap. The COMMIT DECISION,
  * however, is NOT the insert: the winner first stages the entry bytes
  * at a UNIQUE hidden name (never contended), then PUBLISHES by
  * conditionally updating its own row (`SET staged = <name> WHERE
  * claimed_at_ms = mine AND staged IS NULL`) — one atomic row update,
  * valid on any filesystem — and only then materializes the canonical
  * entry path as the single publisher. That ordering closes the
  * stolen-claim race: a winner that stalls (GC pause, network
  * partition) past `staleClaimMs` can lose its still-UNPUBLISHED row to
  * a stealer, and its own publish update then matches nothing — it
  * reports a lost race, never a phantom commit. Two callers can never
  * both believe they committed one version, and the contended path is
  * never plain-created by two writers (previously both a stalled winner
  * and its stealer ran `fs.create(p, false)`, which is check-then-create
  * on `file:` and last-writer-wins on an object store — a silent lost
  * update). With the race closed, a long GC pause costs the paused
  * writer a clean retry, nothing more, so `staleClaimMs` stays a
  * liveness knob rather than a correctness one.
  *
  * Self-healing ladder for dead claims, keyed off the observed row:
  *  - UNPUBLISHED row + entry absent + stale: the owner died between
  *    INSERT and publication — STEAL it, deleting exactly the observed
  *    row (timestamp AND unpublished-ness in the predicate, so a row
  *    the owner publishes or a successor re-claims in the meantime
  *    matches nothing) and re-inserting once.
  *  - PUBLISHED row + entry absent + staged bytes present: the owner
  *    died between publication and materialize — the commit IS durable;
  *    a later claimer HEALS the canonical path from the staged bytes
  *    and reports its own claim lost. (The same applies after REPAIR
  *    LOG quarantines a torn canonical entry: the staged backup
  *    restores it.)
  *  - PUBLISHED row + entry AND staged bytes both absent (quarantined
  *    and reaped — operator-sanctioned amputation): past the safety age
  *    the row is dead weight and becomes stealable again.
  *
  * This is the deployment shape for object-store-only lakes with no
  * shared POSIX volume for [[LockFileCommitStore]]: point `url` at any
  * shared RDBMS (the SQL is one CREATE TABLE and per-claim INSERT /
  * UPDATE / DELETE — standard everywhere; unique-violation detection
  * uses SQLState 23505) and every shared-nothing writer arbitrates
  * through the same row space. Connections are per-claim (claims are
  * rare — one per commit — and pooling would add a dependency for
  * nothing).
  *
  * Tests run it on embedded Derby (the JDBC engine available offline),
  * which is single-process by design — so the cross-PROCESS race is
  * exercised structurally (the CAS is the database's PK, identical from
  * one process or many) and the multi-writer and steal races are fuzzed
  * across threads; [[LockFileCommitStore]] remains the store proven by
  * the 3-JVM fuzz in this environment.
  */
final class JdbcCommitStore(url: String, table: String = "graft_commits",
                            staleClaimMs: Long = 60000L)
    extends CommitStore {

  @volatile private var ready = false

  /** Test seam: called with "inserted" right after a won CAS insert,
    * "staged" after the staged bytes land (both BEFORE publication),
    * and "published" right after the atomic row publication but BEFORE
    * the canonical entry materializes — lets a spec freeze or crash a
    * winner inside the exact windows the steal/heal ladder exists for.
    * No-op in production.
    */
  @volatile private[lake] var pauseHook: String => Unit = _ => ()

  private def withConn[A](body: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try body(c) finally c.close()
  }

  private def ensureTable(): Unit = {
    if (ready) return
    synchronized {
      if (ready) return
      withConn { c =>
        try {
          val st = c.createStatement()
          try st.executeUpdate(
            s"CREATE TABLE $table (log_dir VARCHAR(900) NOT NULL, " +
              "entry VARCHAR(100) NOT NULL, claimed_at_ms BIGINT, " +
              "staged VARCHAR(120), " +
              s"PRIMARY KEY (log_dir, entry))")
          finally st.close()
        } catch {
          case e: java.sql.SQLException
            // Derby X0Y32 / standard 42S01-42P07: table already there
            if Set("X0Y32", "42S01", "42P07").contains(e.getSQLState) ||
              Option(e.getMessage).exists(_.toLowerCase.contains("exist")) =>
            ()
        }
      }
      ready = true
    }
  }

  override def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    doClaim(fs, p, bytes, allowSteal = true)

  private def rowOf(dir: String,
                    entry: String): Option[(Long, Option[String])] =
    withConn { c =>
      val q = c.prepareStatement(
        s"SELECT claimed_at_ms, staged FROM $table " +
          "WHERE log_dir = ? AND entry = ?")
      try {
        q.setString(1, dir); q.setString(2, entry)
        val rs = q.executeQuery()
        try {
          if (rs.next()) Some((rs.getLong(1), Option(rs.getString(2))))
          else None
        } finally rs.close()
      } finally q.close()
    }

  /** Delete exactly the observed row: timestamp AND publication state
    * in the predicate, so neither a stealer nor the row's own late
    * owner can ever delete a successor's (or a just-published) claim.
    */
  private def deleteRow(dir: String, entry: String, claimedAtMs: Long,
                        staged: Option[String]): Boolean =
    withConn { c =>
      val del = c.prepareStatement(
        s"DELETE FROM $table WHERE log_dir = ? AND entry = ? " +
          s"AND claimed_at_ms = ? AND staged ${staged.fold("IS NULL")(_ => "= ?")}")
      try {
        del.setString(1, dir); del.setString(2, entry)
        del.setLong(3, claimedAtMs)
        staged.foreach(del.setString(4, _))
        del.executeUpdate() == 1
      } finally del.close()
    }

  /** The atomic commit decision: flips OUR still-unpublished row to
    * published. Zero rows updated = the row was stolen (or never ours
    * anymore) — the claim is lost, not committed.
    */
  private def publishRow(dir: String, entry: String, claimedAtMs: Long,
                         stagedName: String): Boolean =
    withConn { c =>
      val up = c.prepareStatement(
        s"UPDATE $table SET staged = ? WHERE log_dir = ? AND entry = ? " +
          "AND claimed_at_ms = ? AND staged IS NULL")
      try {
        up.setString(1, stagedName); up.setString(2, dir)
        up.setString(3, entry); up.setLong(4, claimedAtMs)
        up.executeUpdate() == 1
      } finally up.close()
    }

  /** Materialize the canonical entry path from published bytes. Only
    * the published owner and HEALERS (copying the same staged bytes)
    * reach here, so a target that already exists WITH those bytes is a
    * benign race; different bytes mean the path is occupied by
    * something foreign — loud. `file:` hard-links the staged file in
    * (atomic, never torn); other schemes use a plain create, safe
    * post-publication (single logical writer, same-content healers).
    */
  private def materialize(fs: FileSystem, p: Path, staged: Path,
                          bytes: Array[Byte]): Unit = {
    val created =
      if (fs.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.Paths.get(staged.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } else {
        try {
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
          true
        } catch { case _: IOException => false }
      }
    if (!created &&
        !java.util.Arrays.equals(
          try FsCommitStore.read(fs, p)
          catch { case _: IOException => Array.emptyByteArray },
          bytes))
      throw new IOException(
        s"commit entry path $p is occupied by bytes that are not this " +
          "claim's published content — refusing to overwrite")
  }

  private def doClaim(fs: FileSystem, p: Path, bytes: Array[Byte],
                      allowSteal: Boolean): Boolean = {
    ensureTable()
    val dir = p.getParent.toUri.toString.takeRight(900)
    val myTs = System.currentTimeMillis()
    val won = withConn { c =>
      val ps = c.prepareStatement(
        s"INSERT INTO $table (log_dir, entry, claimed_at_ms) VALUES (?, ?, ?)")
      try {
        ps.setString(1, dir)
        ps.setString(2, p.getName)
        ps.setLong(3, myTs)
        try { ps.executeUpdate(); true }
        catch {
          case e: java.sql.SQLException
            if e.getSQLState == "23505" ||
              e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] =>
            false // lost the CAS
        }
      } finally ps.close()
    }
    if (!won) {
      rowOf(dir, p.getName) match {
        case None =>
          // the row vanished between our insert and this read (its
          // owner rolled back, or steal churn): the caller's commit
          // loop re-reads state and retries the version
          false
        case Some((ts, Some(stagedName))) =>
          // PUBLISHED: the version is committed, our claim is lost.
          // Heal a canonical path the dead owner never materialized
          // (or REPAIR LOG quarantined) from the staged backup.
          val sp = new Path(p.getParent, stagedName)
          if (!fs.exists(p) && fs.exists(sp)) {
            try materialize(fs, p, sp, FsCommitStore.read(fs, sp))
            catch { case _: IOException => () } // healed concurrently, or junk — lost either way
            false
          } else if (allowSteal && !fs.exists(p) && !fs.exists(sp) &&
              System.currentTimeMillis() - ts >= staleClaimMs &&
              deleteRow(dir, p.getName, ts, Some(stagedName))) {
            // entry AND backup amputated (REPAIR LOG + maintenance):
            // past the safety age the published row is dead weight
            doClaim(fs, p, bytes, allowSteal = false)
          } else false
        case Some((ts, None)) =>
          // UNPUBLISHED: the owner may be mid-flight; past the safety
          // age with no entry file it died before the commit decision —
          // steal exactly the observed row and retry the insert once
          if (allowSteal && !fs.exists(p) &&
              System.currentTimeMillis() - ts >= staleClaimMs &&
              deleteRow(dir, p.getName, ts, None))
            doClaim(fs, p, bytes, allowSteal = false)
          else false
      }
    } else {
      pauseHook("inserted")
      // CAS won — but the claim COMMITS only at publishRow below. Stage
      // the bytes at a unique, never-contended hidden name first; a
      // failure rolls our unpublished row back (or the steal ladder
      // reaps it later) so the version is never wedged.
      val stagedName =
        s".${p.getName}.${UUID.randomUUID().toString.take(8)}.jdbcstaged"
      val sp = new Path(p.getParent, stagedName)
      try {
        val out = fs.create(sp, true)
        try out.write(bytes) finally out.close()
      } catch {
        case t: Throwable =>
          try { deleteRow(dir, p.getName, myTs, None); () }
          catch { case rb: Throwable => t.addSuppressed(rb) }
          throw t
      }
      pauseHook("staged")
      if (!publishRow(dir, p.getName, myTs, stagedName)) {
        // our row was stolen while we stalled: the OTHER claimant owns
        // the version — clean our staging, report the lost race
        try { fs.delete(sp, false); () } catch { case _: IOException => () }
        false
      } else {
        // the commit decision is MADE: a crash from here on leaves a
        // published row + staged bytes, which any later claimer heals
        pauseHook("published")
        try { materialize(fs, p, sp, bytes); true }
        catch {
          case t: Throwable =>
            // canonical path obstructed by foreign bytes: undo the
            // publication entirely (row + staging) so the version
            // unwedges once the obstruction is cleared
            try { deleteRow(dir, p.getName, myTs, Some(stagedName)); () }
            catch { case rb: Throwable => t.addSuppressed(rb) }
            try { fs.delete(sp, false); () }
            catch { case rb: Throwable => t.addSuppressed(rb) }
            throw t
        }
      }
    }
  }

  override def read(fs: FileSystem, p: Path): Array[Byte] =
    FsCommitStore.read(fs, p)

  override def list(fs: FileSystem, dir: Path): Seq[Path] =
    FsCommitStore.list(fs, dir)
}

package graft.lake

import graft.SparkSpec
import java.nio.file.Files

/** Test-only FileSystem that reports scheme `s3a://testbucket` over the
  * local disk — how the suite exercises [[FsCommitStore]]'s s3-scheme
  * claim delegation without a real bucket: data I/O goes through the
  * (local) filesystem exactly like S3A would serve it, while commit
  * CLAIMS route through the conditional-PUT store built from this
  * filesystem's own `fs.s3a.*` configuration, against the emulator.
  */
class FakeS3AFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a://testbucket")
}

/** [[ObjectStoreCommitStore]] — the shared-nothing object-store CAS:
  * one conditional PUT (`If-None-Match: *`) IS the claim. Races decided
  * by the store, 409 conflicts retried to a decision, SigV4 auth,
  * commit-loop integration, and the s3a-scheme auto-delegation that
  * replaces the old claim-time refusal.
  */
class ObjectStoreCommitStoreSpec extends SparkSpec {

  import spark.implicits._

  private def fsFor(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def storeFor(em: S3Emulator, root: String,
                       creds: Option[(String, String)] = None) =
    new ObjectStoreCommitStore(em.endpoint, credentials = creds,
      mapPath = ObjectStoreCommitStore.prefixMap(root, "lake"))

  test("racing same-path claims: the conditional PUT admits exactly one winner") {
    val dir = Files.createTempDirectory("graft-s3race").toString
    val em = new S3Emulator(dir)
    try {
      val store = storeFor(em, dir)
      val fs = fsFor(dir)
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
      // the winner's bytes are whole (the PUT is atomic — no torn tail)
      // and a later claim loses to the existing object
      new String(store.read(fs, p)) should startWith("writer-")
      store.claim(fs, p, "late".getBytes) shouldBe false
    } finally em.stop()
  }

  test("409 ConditionalRequestConflict retries to a real decision; persistent conflict fails loudly") {
    val dir = Files.createTempDirectory("graft-s3chaos").toString
    // every 2nd PUT is bounced 409 WITHOUT effect: claims land on
    // retry, and a lost race still reads 412 through the chaos
    val em = new S3Emulator(dir, chaosEvery = 2)
    try {
      val store = storeFor(em, dir)
      val fs = fsFor(dir)
      val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
      store.claim(fs, p, "first".getBytes) shouldBe true  // PUT #1: clean
      // PUT #2 bounces 409, the conditional retry reads the truth: 412
      store.claim(fs, p, "second".getBytes) shouldBe false
      em.conflictsInjected should be >= 1
      new String(store.read(fs, p)) shouldBe "first"
    } finally em.stop()
    // a store that NEVER gets a decision must fail loudly, not guess
    val dir2 = Files.createTempDirectory("graft-s3chaos2").toString
    val em2 = new S3Emulator(dir2, chaosEvery = 1) // all PUTs bounce
    try {
      val store2 = new ObjectStoreCommitStore(em2.endpoint,
        mapPath = ObjectStoreCommitStore.prefixMap(dir2, "lake"),
        maxAttempts = 3)
      val e = intercept[java.io.IOException](store2.claim(fsFor(dir2),
        new org.apache.hadoop.fs.Path(s"$dir2/x.json"), "b".getBytes))
      e.getMessage should include("no decision")
    } finally em2.stop()
  }

  test("endpoint-region inference: real AWS spellings resolve, non-regions never do") {
    import ObjectStoreCommitStore.regionFromEndpoint
    regionFromEndpoint("s3.eu-west-1.amazonaws.com") shouldBe
      Some("eu-west-1")
    regionFromEndpoint("https://s3.us-east-2.amazonaws.com") shouldBe
      Some("us-east-2")
    regionFromEndpoint("s3.dualstack.ap-southeast-2.amazonaws.com") shouldBe
      Some("ap-southeast-2")
    // FIPS dualstack is fips-THEN-dualstack on the wire
    regionFromEndpoint("s3-fips.dualstack.us-west-2.amazonaws.com") shouldBe
      Some("us-west-2")
    regionFromEndpoint("s3-fips.us-gov-west-1.amazonaws.com") shouldBe
      Some("us-gov-west-1")
    // accelerate is NOT a region; custom endpoints infer nothing
    regionFromEndpoint("s3-accelerate.amazonaws.com") shouldBe None
    regionFromEndpoint("minio.internal:9000") shouldBe None
  }

  test("an ambiguous win (500 after the object landed) is recognized on read-back") {
    val dir = Files.createTempDirectory("graft-s3ambig").toString
    // every create answers 500 AFTER the object is durable: the winner
    // never hears its win; the conditional retry then sees 412 on its
    // OWN bytes. Reporting that as a lost race would make the commit
    // loop re-commit the same operations at the next version — silent
    // data duplication — so the store must read back and compare.
    val em = new S3Emulator(dir, ambiguousEvery = 1)
    try {
      val store = storeFor(em, dir)
      val fs = fsFor(dir)
      val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
      store.claim(fs, p, "mine".getBytes) shouldBe true
      new String(store.read(fs, p)) shouldBe "mine"
      em.conflictsInjected shouldBe 1
      // a later claim of the taken key never saw ambiguity: plain loss,
      // no read-back needed
      store.claim(fs, p, "late".getBytes) shouldBe false
    } finally em.stop()
  }

  test("the GCS interop store claims through x-goog-if-generation-match, same CAS contract") {
    val dir = Files.createTempDirectory("graft-gcs").toString
    val em = new S3Emulator(dir)
    try {
      // HMAC-key interop mode: AWS-V4-signed requests, the GCS
      // precondition header carrying the create-if-absent condition —
      // the store the gs refusal message names for CommitStore.install
      val store = ObjectStoreCommitStore.gcsInterop("GOOGHMAC", "gsecret",
        endpoint = em.endpoint,
        mapPath = ObjectStoreCommitStore.prefixMap(dir, "lake"))
      val fs = fsFor(dir)
      val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until 8).map { i =>
        new Thread(() => {
          if (store.claim(fs, p, s"gcs-$i".getBytes)) wins.incrementAndGet()
          ()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      wins.get() shouldBe 1
      new String(store.read(fs, p)) should startWith("gcs-")
      store.claim(fs, p, "late".getBytes) shouldBe false
      // the whole commit loop runs through it once installed
      val root = s"$dir/table"
      CommitStore.install(root, store)
      try {
        TxLog.append(spark, Seq(("a", 1L)).toDF("k", "n"), root)
        TxLog.append(spark, Seq(("b", 2L)).toDF("k", "n"), root)
        TxLog.readLatest(spark, root).as[(String, Long)].collect()
          .toSet shouldBe Set(("a", 1L), ("b", 2L))
      } finally CommitStore.uninstall(root)
    } finally em.stop()
  }

  test("SigV4-signed claims verify end-to-end; wrong credentials are refused loudly") {
    val dir = Files.createTempDirectory("graft-s3auth").toString
    val creds = ("AKIDTEST", "secret/key+EXAMPLE")
    val em = new S3Emulator(dir, requireAuth = Some(creds))
    try {
      val fs = fsFor(dir)
      val good = storeFor(em, dir, creds = Some(creds))
      val p = new org.apache.hadoop.fs.Path(s"$dir/00000000000000000000.json")
      good.claim(fs, p, "signed".getBytes) shouldBe true
      new String(good.read(fs, p)) shouldBe "signed"
      val bad = storeFor(em, dir, creds = Some(("AKIDTEST", "wrong")))
      val e = intercept[java.io.IOException](bad.claim(fs,
        new org.apache.hadoop.fs.Path(s"$dir/00000000000000000001.json"),
        "x".getBytes))
      e.getMessage should include("403")
    } finally em.stop()
  }

  test("concurrent writers through the commit loop on the object store: no lost updates") {
    val root = Files.createTempDirectory("graft-s3loop").toString
    val em = new S3Emulator(root, chaosEvery = 7)
    CommitStore.install(root, storeFor(em, root))
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
    } finally { CommitStore.uninstall(root); em.stop() }
  }

  test("an s3a table root claims through the conditional PUT with NO install (the refusal is gone)") {
    val dir = Files.createTempDirectory("graft-s3a-root").toString
    // the emulator serves the WHOLE local filesystem as bucket space:
    // s3PathMap keys are the absolute path, so backing is "/"
    val em = new S3Emulator("/")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[FakeS3AFileSystem].getName)
    hconf.set("fs.s3a.endpoint", em.endpoint)
    hconf.setBoolean("fs.s3a.path.style.access", true)
    val root = s"s3a://testbucket$dir"
    try {
      TxLog.append(spark, Seq(("a", 1L)).toDF("k", "v"), root) shouldBe 0L
      TxLog.append(spark, Seq(("b", 2L)).toDF("k", "v"), root) shouldBe 1L
      TxLog.readLatest(spark, root).as[(String, Long)].collect().toSet shouldBe
        Set(("a", 1L), ("b", 2L))
      em.puts should be >= 2 // the claims really went over the wire
    } finally {
      em.stop()
      hconf.unset("fs.s3a.impl")
      hconf.unset("fs.s3a.endpoint")
      hconf.unset("fs.s3a.path.style.access")
    }
  }
}

/** The published AWS Signature V4 reference vector (AWS General
  * Reference, "Examples of the complete Signature Version 4 signing
  * process": GET iam.amazonaws.com ListUsers, 2015-08-30) — pins the
  * canonicalization + HMAC chain to the public specification
  * independently of our own emulator.
  */
class SigV4Spec extends org.scalatest.funsuite.AnyFunSuite
    with org.scalatest.matchers.should.Matchers {

  test("matches the AWS reference signature") {
    val headers = SigV4.signedHeaders(
      method = "GET",
      uri = java.net.URI.create(
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      headers = Map(
        "host" -> "iam.amazonaws.com",
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8"),
      payloadSha256 = SigV4.sha256Hex(Array.emptyByteArray),
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      sessionToken = None,
      region = "us-east-1",
      service = "iam",
      now = java.time.Instant.parse("2015-08-30T12:36:00Z"),
      signPayloadHeader = false)
    headers("x-amz-date") shouldBe "20150830T123600Z"
    headers("Authorization") shouldBe
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/" +
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
  }
}

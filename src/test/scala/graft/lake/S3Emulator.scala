package graft.lake

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal S3-protocol CONDITIONAL-WRITE emulator for the commit-store
  * tests: accepts path-style `PUT /bucket/key` with `If-None-Match: *`
  * and enforces create-if-absent atomically against `backingDir` (the
  * same directory the table's FileSystem reads, so reads/listings see
  * exactly what the "object store" accepted — the strong-consistency
  * contract real S3 has provided since 2020). Responses follow the S3
  * conditional-write contract the store maps:
  *
  *   - 200 — object created (bytes moved into place atomically BEFORE
  *     the response, so a winner's entry is durable when acknowledged)
  *   - 412 — key exists (PreconditionFailed)
  *   - 409 — injected `ConditionalRequestConflict` chaos: every
  *     `chaosEvery`-th PUT is bounced WITHOUT effect, exactly the
  *     "outcome unknown, retry the conditional PUT" case S3 documents
  *     for concurrent conditional writes
  *   - 400 — a PUT without `If-None-Match: *` (the store must never
  *     fall back to an unconditional PUT: that is the lost-update bug
  *     the whole seam exists to prevent)
  *   - 403 — when `requireAuth` is set and the request's SigV4
  *     signature (recomputed from the received headers) doesn't match
  *
  * Requests are handled on a thread pool; the create-if-absent decision
  * itself serializes on one monitor — the emulator plays the arbiter
  * role the real object store owns.
  */
final class S3Emulator(backingDir: String, chaosEvery: Int = 0,
                       requireAuth: Option[(String, String)] = None,
                       ambiguousEvery: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 64)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
  private val lock = new Object
  private val putCount = new AtomicInteger(0)
  private val chaosCount = new AtomicInteger(0)

  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  def endpoint: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  def puts: Int = putCount.get()
  def conflictsInjected: Int = chaosCount.get()

  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val b = body.getBytes("UTF-8")
    if (b.isEmpty) ex.sendResponseHeaders(code, -1)
    else {
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
    }
    ex.close()
  }

  private def authOk(ex: HttpExchange, payload: Array[Byte]): Boolean =
    requireAuth match {
      case None => true
      case Some((ak, sk)) =>
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .getOrElse(return false)
        val amzDate = Option(ex.getRequestHeaders.getFirst("x-amz-date"))
          .getOrElse(return false)
        // recompute the signature over the same canonical inputs the
        // client signed (host + the amz headers) and compare
        val expected = SigV4.signedHeaders("PUT",
          java.net.URI.create(endpoint + ex.getRequestURI.toString),
          Map("host" -> s"127.0.0.1:${server.getAddress.getPort}"),
          SigV4.sha256Hex(payload), ak, sk, None, "us-east-1", "s3",
          java.time.Instant.from(java.time.format.DateTimeFormatter
            .ofPattern("yyyyMMdd'T'HHmmss'Z'")
            .withZone(java.time.ZoneOffset.UTC).parse(amzDate)))
        expected("Authorization") == auth &&
          expected("x-amz-content-sha256") ==
            ex.getRequestHeaders.getFirst("x-amz-content-sha256")
    }

  private def handle(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod == "GET") {
        // read-back support (the store's 412-after-ambiguity self-check)
        val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
          .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
        if (segs.length < 2) { respond(ex, 400, "no key"); return }
        val target = Paths.get(backingDir, segs.drop(1): _*)
        if (!Files.exists(target)) { respond(ex, 404); return }
        val b = Files.readAllBytes(target)
        ex.sendResponseHeaders(200, b.length.toLong)
        ex.getResponseBody.write(b)
        ex.close()
        return
      }
      if (ex.getRequestMethod != "PUT") { respond(ex, 405); return }
      val body = ex.getRequestBody.readAllBytes()
      putCount.incrementAndGet()
      if (!authOk(ex, body)) { respond(ex, 403, "SignatureDoesNotMatch"); return }
      // either create-if-absent spelling: S3's If-None-Match: * or
      // GCS's x-goog-if-generation-match: 0 (the interop-mode store)
      val s3Cond = Option(ex.getRequestHeaders.getFirst("If-None-Match"))
        .contains("*")
      val gcsCond = Option(
        ex.getRequestHeaders.getFirst("x-goog-if-generation-match"))
        .contains("0")
      if (!s3Cond && !gcsCond) {
        respond(ex, 400, "unconditional PUT refused by this emulator")
        return
      }
      // path-style: /bucket/key... — the bucket segment is dropped, the
      // key lands under backingDir (which the test's FileSystem reads)
      val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty)
        .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
      if (segs.length < 2) { respond(ex, 400, "no key"); return }
      val target = Paths.get(backingDir, segs.drop(1): _*)
      if (chaosEvery > 0 && putCount.get() % chaosEvery == 0) {
        chaosCount.incrementAndGet()
        respond(ex, 409, "<Error><Code>ConditionalRequestConflict</Code></Error>")
        return
      }
      val created = lock.synchronized {
        if (Files.exists(target)) false
        else {
          Files.createDirectories(target.getParent)
          val tmp = Files.createTempFile(target.getParent,
            ".s3emu-", ".tmp")
          Files.write(tmp, body)
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          true
        }
      }
      if (created && ambiguousEvery > 0 &&
          putCount.get() % ambiguousEvery == 0) {
        // the "won but never heard it" fault: the object IS durable but
        // the success response is replaced by a 500 — the store's retry
        // then sees 412 on its own bytes and must read back, not report
        // a lost race
        chaosCount.incrementAndGet()
        respond(ex, 500, "<Error><Code>InternalError</Code></Error>")
        return
      }
      if (created) {
        ex.getResponseHeaders.set("ETag",
          "\"" + SigV4.sha256Hex(body).take(32) + "\"")
        respond(ex, 200)
      } else respond(ex, 412, "<Error><Code>PreconditionFailed</Code></Error>")
    } catch {
      case t: Throwable =>
        try respond(ex, 500, String.valueOf(t)) catch { case _: Throwable => () }
    }
}

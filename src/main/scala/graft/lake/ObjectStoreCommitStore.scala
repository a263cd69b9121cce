package graft.lake

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.hadoop.fs.{FileSystem, Path}

/** AWS Signature Version 4 request signing — the public algorithm
  * (HMAC-SHA256 chain over a canonical request), implemented directly so
  * the object-store commit store needs no SDK: JDK crypto is enough.
  * Covers exactly what the store sends (single-shot requests, payload
  * hash in `x-amz-content-sha256`, no query signing). Verified against
  * the published AWS reference vector in `SigV4Spec`.
  */
private[lake] object SigV4 {

  private val AmzDate =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
  private val ShortDate =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 encode for canonical URIs/queries ('/' preserved only in
    * paths — the caller picks via `keepSlash`).
    */
  private def uriEncode(s: String, keepSlash: Boolean): String = {
    val out = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      // ASCII unreserved ONLY: isLetterOrDigit is true for latin-1
      // letters >= 0x80, which would emit UTF-8 continuation bytes raw
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' ||
        c == '~'
      if (unreserved || (keepSlash && c == '/')) out.append(c)
      else out.append(f"%%${b & 0xff}%02X")
    }
    out.toString
  }

  /** The headers to add to a request: `x-amz-date`, `x-amz-content-sha256`
    * (+ session token when present) and `Authorization`. `headers` must
    * already include every header to be signed EXCEPT the amz ones this
    * adds (at minimum `host`). `signPayloadHeader=false` omits
    * `x-amz-content-sha256` from the signed set (non-S3 services — the
    * published AWS reference vector `SigV4Spec` checks is one).
    */
  def signedHeaders(method: String, uri: URI, headers: Map[String, String],
                    payloadSha256: String, accessKey: String,
                    secretKey: String, sessionToken: Option[String],
                    region: String, service: String,
                    now: Instant,
                    signPayloadHeader: Boolean = true): Map[String, String] = {
    val amzDate = AmzDate.format(now)
    val shortDate = ShortDate.format(now)
    val all = headers ++ Map("x-amz-date" -> amzDate) ++
      (if (signPayloadHeader) Map("x-amz-content-sha256" -> payloadSha256)
       else Map.empty[String, String]) ++
      sessionToken.map("x-amz-security-token" -> _)
    val canonHeaders = all.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v.trim
    }.toSeq.sortBy(_._1)
    val signedList = canonHeaders.map(_._1).mkString(";")
    val canonQuery = Option(uri.getRawQuery).filter(_.nonEmpty).map { q =>
      q.split("&").toSeq.map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
      }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    }.getOrElse("")
    val canonPath = {
      val p = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
      // S3's single-encode rule: the canonical URI is the raw path
      // EXACTLY as sent on the wire — any re-encoding here must
      // reproduce the client's percent-encoding byte-for-byte or the
      // signature breaks ('~' and multi-byte UTF-8 key characters were
      // the divergences), so for s3 it is not re-encoded at all. Other
      // services keep the normalize-and-encode path (the published AWS
      // reference vector SigV4Spec checks is one).
      if (service == "s3") p
      else uriEncode(java.net.URLDecoder.decode(p, "UTF-8"), keepSlash = true)
    }
    val canonicalRequest = Seq(method, canonPath, canonQuery,
      canonHeaders.map { case (k, v) => s"$k:$v\n" }.mkString,
      signedList, payloadSha256).mkString("\n")
    val scope = s"$shortDate/$region/$service/aws4_request"
    val toSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes(StandardCharsets.UTF_8)))
      .mkString("\n")
    val kSigning = hmac(hmac(hmac(hmac(
      s"AWS4$secretKey".getBytes(StandardCharsets.UTF_8), shortDate),
      region), service), "aws4_request")
    val sig = hmac(kSigning, toSign).map("%02x".format(_)).mkString
    Map("x-amz-date" -> amzDate,
      "Authorization" -> (s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
        s"SignedHeaders=$signedList, Signature=$sig")) ++
      (if (signPayloadHeader) Map("x-amz-content-sha256" -> payloadSha256)
       else Map.empty[String, String]) ++
      sessionToken.map("x-amz-security-token" -> _)
  }
}

/** DURABLE shared-nothing CAS commit store for S3-COMPATIBLE OBJECT
  * STORES: the claim is ONE conditional HTTP PUT of the entry bytes with
  * `If-None-Match: *` — the store itself enforces create-if-absent (S3
  * has supported conditional writes since 2024; MinIO, R2 and most
  * S3-compatible stores honor the same header). No shared volume, no
  * RDBMS, no coordinator table: the object store that already holds the
  * lake IS the arbiter, and the entry is content-complete the instant it
  * becomes visible (no torn tails, no publish window — the PUT either
  * lands whole or not at all).
  *
  * Outcome mapping, per the S3 conditional-write contract:
  *  - 2xx: the claim WON — the object now exists with our bytes.
  *  - 412 Precondition Failed: the key exists — a racing writer won.
  *  - 409 ConditionalRequestConflict: concurrent conditional PUTs on the
  *    same key collided mid-decision; the outcome is UNKNOWN — retry the
  *    same conditional PUT until the store answers 2xx or 412 (the
  *    retry is safe precisely because the PUT is conditional).
  *  - Other statuses / transport errors: bounded retries on 5xx, then
  *    loud failure (a claim that cannot reach the arbiter must not
  *    guess).
  *
  * Reads and listings stay on the data filesystem (S3 reads and listings
  * are strongly consistent since 2020; the S3A connector the table root
  * already uses serves them) — only the CLAIM needs the HTTP path,
  * because Hadoop's FileSystem API exposes no conditional create.
  *
  * Auth: SigV4-signed when credentials are provided ([[SigV4]] — JDK
  * crypto, no SDK), anonymous otherwise (IAM-less MinIO, pre-signed
  * test endpoints). Addressing: virtual-host style
  * (`https://bucket.endpoint/key`) or path-style
  * (`https://endpoint/bucket/key`) — path-style is the default for
  * custom endpoints, matching the S3A convention.
  *
  * Install: `CommitStore.install(tableRootPrefix, store)`, or let
  * [[FsCommitStore]] build one from the S3A configuration automatically
  * when a claim reaches an `s3`/`s3a` root
  * ([[ObjectStoreCommitStore.fromHadoopConf]]).
  */
final class ObjectStoreCommitStore(
    endpoint: String,
    region: String = "us-east-1",
    credentials: Option[(String, String)] = None,
    sessionToken: Option[String] = None,
    pathStyle: Boolean = true,
    mapPath: Path => (String, String) = ObjectStoreCommitStore.s3PathMap,
    maxAttempts: Int = 8,
    credSource: Option[() =>
      (Option[(String, String)], Option[String])] = None,
    createCondition: (String, String) =
      ObjectStoreCommitStore.S3CreateCondition) extends CommitStore {

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NEVER)
    .build()

  private val base = URI.create(endpoint.replaceAll("/+$", ""))

  // credentials resolve PER REQUEST when a source is given (rotated STS
  // session tokens must not be frozen at store construction — the store
  // is memoized per filesystem for the JVM's life); the static ctor
  // fields remain for explicitly installed stores and tests
  private def creds(): (Option[(String, String)], Option[String]) =
    credSource.map(_()).getOrElse((credentials, sessionToken))

  private def urlFor(bucket: String, key: String): URI = {
    val encKey = key.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8")
        .replace("+", "%20").replace("*", "%2A")).mkString("/")
    if (pathStyle) URI.create(s"$base/$bucket/$encKey")
    else URI.create(s"${base.getScheme}://$bucket.${base.getAuthority}/$encKey")
  }

  private def signInto(builder: HttpRequest.Builder, method: String,
                       uri: URI, payloadSha: String): Unit =
    creds() match {
      case (Some((ak, sk)), tok) =>
        SigV4.signedHeaders(method, uri, Map("host" -> uri.getAuthority),
          payloadSha, ak, sk, tok, region, "s3",
          Instant.now()).foreach { case (k, v) =>
          if (!k.equalsIgnoreCase("host")) builder.header(k, v)
        }
      case _ => ()
    }

  /** Read the object back — the 412-after-ambiguity self-check. Loud on
    * anything but 200: a claim that cannot verify ownership must not
    * guess in either direction.
    */
  private def getObject(uri: URI): Array[Byte] = {
    val builder = HttpRequest.newBuilder(uri)
      .timeout(java.time.Duration.ofSeconds(30)).GET()
    signInto(builder, "GET", uri, SigV4.sha256Hex(Array.emptyByteArray))
    val resp = http.send(builder.build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200)
      throw new IOException(
        s"read-back GET $uri after an ambiguous conditional PUT " +
          s"returned HTTP ${resp.statusCode()} — cannot decide claim " +
          "ownership")
    resp.body()
  }

  override def claim(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean = {
    val (bucket, key) = mapPath(p)
    val uri = urlFor(bucket, key)
    var attempt = 0
    var lastFailure: String = ""
    // set once any attempt ends with an UNKNOWN outcome (transport
    // error, 409 conflict, 5xx): the server may have applied our PUT
    // even though we never heard the 2xx
    var ambiguous = false
    while (attempt < maxAttempts) {
      attempt += 1
      val builder = HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(30))
        .header(createCondition._1, createCondition._2)
        .header("Content-Type", "application/octet-stream")
      signInto(builder, "PUT", uri, SigV4.sha256Hex(bytes))
      val req = builder
        .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)).build()
      val sent: Either[String, (Int, String)] =
        try {
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          Right((resp.statusCode(), resp.body()))
        } catch {
          case e: IOException => Left(s"transport: $e")
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new IOException("interrupted during commit claim", e)
        }
      sent match {
        case Right((s, _)) if s >= 200 && s < 300 => return true
        case Right((412, _)) =>
          // a 412 AFTER an ambiguous attempt can be our own earlier PUT
          // having landed: reporting that as a lost race makes the
          // caller re-commit the same operations at the next version —
          // silent data duplication. Read back and compare.
          if (!ambiguous) return false
          return java.util.Arrays.equals(getObject(uri), bytes)
        case Right((409, body)) =>
          // concurrent conditional writes collided: outcome unknown —
          // the conditional retry converges to 2xx or 412
          ambiguous = true
          lastFailure = s"409 conflict: ${body.take(200)}"
        case Right((s, body)) if s >= 500 =>
          ambiguous = true
          lastFailure = s"$s: ${body.take(200)}"
        case Right((403, body)) =>
          throw new IOException(
            s"conditional PUT $uri failed with HTTP 403: " +
              s"${body.take(300)} — the commit claim signs with " +
              "fs.s3a.access.key/secret.key (or AWS_ACCESS_KEY_ID/" +
              "AWS_SECRET_ACCESS_KEY); instance-profile/provider-chain " +
              "deployments must install a CommitStore with a credSource " +
              "that resolves their credentials (CommitStore.install)")
        case Right((s, body)) =>
          throw new IOException(
            s"conditional PUT $uri failed with HTTP $s: ${body.take(500)}")
        case Left(why) => ambiguous = true; lastFailure = why
      }
      Thread.sleep(math.min(100L * attempt, 1000L))
    }
    throw new IOException(
      s"conditional PUT $uri: no decision after $maxAttempts attempts " +
        s"(last: $lastFailure)")
  }

  override def read(fs: FileSystem, p: Path): Array[Byte] =
    FsCommitStore.read(fs, p)

  override def list(fs: FileSystem, dir: Path): Seq[Path] =
    FsCommitStore.list(fs, dir)
}

object ObjectStoreCommitStore {

  /** S3's create-if-absent condition (native conditional writes, 2024+;
    * MinIO/R2 honor the same header).
    */
  val S3CreateCondition: (String, String) = ("If-None-Match", "*")

  /** GCS's create-if-absent condition (XML API preconditions):
    * generation 0 means "only if the object does not exist"; a taken
    * key answers 412 Precondition Failed — the same outcome mapping
    * [[ObjectStoreCommitStore.claim]] already speaks.
    */
  val GcsCreateCondition: (String, String) = ("x-goog-if-generation-match", "0")

  /** A store for Google Cloud Storage through its S3-INTEROPERABILITY
    * mode (public contract: storage.googleapis.com accepts HMAC-key
    * requests signed with the AWS V4 algorithm) with the create claim
    * conditioned on `x-goog-if-generation-match: 0`. This is the
    * CAS-backed store the `gs` claim-time refusal points at — install
    * it for the table-root prefix (`CommitStore.install`); there is no
    * auto-delegation because the GCS Hadoop connector authenticates via
    * OAuth service accounts, from which interop HMAC keys are not
    * derivable. `region` rides the V4 credential scope — interop
    * examples use "us-east-1"; override if your deployment's scope
    * differs.
    */
  def gcsInterop(hmacKey: String, hmacSecret: String,
                 endpoint: String = "https://storage.googleapis.com",
                 region: String = "us-east-1",
                 mapPath: Path => (String, String) = s3PathMap)
      : ObjectStoreCommitStore =
    new ObjectStoreCommitStore(endpoint, region,
      credentials = Some((hmacKey, hmacSecret)),
      pathStyle = true, mapPath = mapPath,
      createCondition = GcsCreateCondition)

  /** The natural map for `s3a://bucket/key...` paths. */
  val s3PathMap: Path => (String, String) = { p =>
    val u = p.toUri
    require(u.getAuthority != null && u.getAuthority.nonEmpty,
      s"object-store claim path has no bucket authority: $p")
    (u.getAuthority, Option(u.getPath).getOrElse("").stripPrefix("/"))
  }

  /** A map for NON-object-store paths (tests, mixed deployments): strip
    * `localRoot` from the path and claim under `bucket`.
    */
  def prefixMap(localRoot: String, bucket: String): Path => (String, String) = {
    val norm = localRoot.replaceAll("/+$", "")
    p => {
      val full = p.toUri.getPath
      require(full.startsWith(norm + "/") || full == norm,
        s"claim path $p outside mapped root $norm")
      (bucket, full.stripPrefix(norm).stripPrefix("/"))
    }
  }

  /** Build a store from the standard public S3A configuration keys on
    * the filesystem that owns the table root — what [[FsCommitStore]]
    * delegates `s3`/`s3a` claims to:
    *
    *  - `fs.s3a.endpoint` (default `s3.<region>.amazonaws.com`),
    *    `fs.s3a.endpoint.region` (default `us-east-1`)
    *  - `fs.s3a.access.key` / `fs.s3a.secret.key` /
    *    `fs.s3a.session.token`, falling back to the standard
    *    `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY` /
    *    `AWS_SESSION_TOKEN` environment contract — re-read PER CLAIM
    *    (the store is memoized for the JVM's life; a rotated STS token
    *    must not be frozen at first use). Absent everywhere means
    *    anonymous requests — the store fails loudly on 403 with the
    *    provider-chain guidance, it never guesses.
    *  - `fs.s3a.path.style.access` (default false — virtual-host, the
    *    AWS convention; custom endpoints usually set it true)
    */
  /** `s3.<region>.amazonaws.com` — the region S3A itself would infer
    * from the endpoint. dualstack/fips decorations are allowed in
    * EITHER order (`s3-fips.dualstack.<r>` is the real FIPS+dualstack
    * spelling), and the capture demands the `xx[-gov|-iso*]-name-N`
    * region shape so `s3-accelerate.amazonaws.com` infers NOTHING
    * (falling back to us-east-1) instead of the non-region
    * "accelerate".
    */
  private val AwsEndpointRegion =
    (raw"(?:.*://)?s3(?:[.-](?:dualstack|fips|external-1))*" +
      raw"[.-]([a-z]{2}(?:-gov)?(?:-iso[a-z]?)?-[a-z]+-\d+)" +
      raw"\.amazonaws\.com.*").r

  /** Test seam for the endpoint-region inference. */
  private[lake] def regionFromEndpoint(ep: String): Option[String] =
    ep match {
      case AwsEndpointRegion(r) => Some(r)
      case _ => None
    }

  def fromHadoopConf(fs: FileSystem): ObjectStoreCommitStore = {
    val conf = fs.getConf
    val rawEp0 = Option(conf.getTrimmed("fs.s3a.endpoint")).filter(_.nonEmpty)
    val region = Option(conf.getTrimmed("fs.s3a.endpoint.region"))
      .filter(_.nonEmpty)
      .orElse(rawEp0.flatMap(regionFromEndpoint))
      .getOrElse("us-east-1")
    val rawEp = rawEp0.getOrElse(s"s3.$region.amazonaws.com")
    val ep = if (rawEp.contains("://")) rawEp else s"https://$rawEp"
    def confOrEnv(k: String, env: String): Option[String] =
      Option(conf.getTrimmed(k)).filter(_.nonEmpty)
        .orElse(sys.env.get(env).filter(_.nonEmpty))
    def resolve(): (Option[(String, String)], Option[String]) = {
      val creds = for {
        ak <- confOrEnv("fs.s3a.access.key", "AWS_ACCESS_KEY_ID")
        sk <- confOrEnv("fs.s3a.secret.key", "AWS_SECRET_ACCESS_KEY")
      } yield (ak, sk)
      (creds, confOrEnv("fs.s3a.session.token", "AWS_SESSION_TOKEN"))
    }
    new ObjectStoreCommitStore(ep, region,
      pathStyle = conf.getBoolean("fs.s3a.path.style.access", false),
      credSource = Some(() => resolve()))
  }
}

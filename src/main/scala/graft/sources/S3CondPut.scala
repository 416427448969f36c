package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}

/** Dependency-free S3 conditional PUT — the commit protocol's atomic
  * exclusive-put primitive for S3-class stores (MinIO, the reference
  * lakehouse's store: k8s/minio/), shipped without hadoop-aws/SDK
  * jars: one SigV4-signed `PUT` with `If-None-Match: *`, so the STORE
  * enforces create-if-absent atomically and two racing writers of the
  * same commit slot resolve server-side (the loser's PUT fails with
  * 412 PreconditionFailed). Content lands whole-object-atomically per
  * S3 semantics — readers never observe a torn commit file.
  *
  * Opt-in through Hadoop conf (see README "MinIO / S3 wiring"):
  * {{{
  *   graft.s3.condput.enabled = true        // the switch (default off)
  *   graft.s3.condput.schemes = s3a,s3      // URI schemes it serves
  *   fs.s3a.endpoint   = http://minio:9000  // full URL, path-style
  *   fs.s3a.access.key / fs.s3a.secret.key
  *   fs.s3a.endpoint.region = us-east-1     // SigV4 scope region
  * }}}
  * When enabled, [[TableIO.writeExclusive]] routes commit-file puts on
  * matching schemes through this adapter; all other I/O (reads, data
  * files, listings) keeps going through the configured Hadoop
  * FileSystem (s3a). Deployments whose s3a already advertises the
  * Hadoop 3.4 `fs.option.create.conditional.overwrite` capability
  * don't need this — the capability branch is equivalent; this
  * adapter covers the hadoop-aws versions that DON'T, where the only
  * alternative was a lock service.
  *
  * Addressing is PATH-STYLE (`endpoint/bucket/key`) — MinIO's default
  * and the shape that works without wildcard DNS. SigV4 signs method,
  * canonical path, host, `x-amz-date`, `x-amz-content-sha256` (the
  * payload hash — content integrity rides the signature), and
  * `if-none-match`, so a MITM can neither alter the bytes nor strip
  * the precondition. */
private[graft] object S3CondPut {

  def enabled(conf: Configuration, scheme: String): Boolean =
    conf.getBoolean("graft.s3.condput.enabled", false) &&
      conf.getTrimmedStrings("graft.s3.condput.schemes", "s3a", "s3")
        .contains(scheme)

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** RFC 3986 encode one path segment (AWS canonical-URI rules:
    * unreserved characters stay, everything else %XX uppercase). */
  private def encodeSegment(s: String): String =
    s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-._~".contains(c)) c.toString
      else c.toString.getBytes(StandardCharsets.UTF_8)
        .map(b => f"%%${b & 0xff}%02X").mkString
    }

  /** The SigV4 Authorization header for this request shape. Exposed
    * private[graft] so the contract spec's fake endpoint can verify
    * the signature by recomputation. */
  private[graft] def authorization(method: String, canonicalPath: String,
      host: String, amzDate: String, payloadHashHex: String,
      accessKey: String, secretKey: String, region: String): String = {
    val date = amzDate.take(8)
    val signedHeaders = "host;if-none-match;x-amz-content-sha256;x-amz-date"
    val canonicalHeaders =
      s"host:$host\nif-none-match:*\n" +
        s"x-amz-content-sha256:$payloadHashHex\nx-amz-date:$amzDate\n"
    val canonicalRequest = s"$method\n$canonicalPath\n\n" +
      s"$canonicalHeaders\n$signedHeaders\n$payloadHashHex"
    val scope = s"$date/$region/s3/aws4_request"
    val stringToSign = "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope + "\n" +
      hex(sha256(canonicalRequest.getBytes(StandardCharsets.UTF_8)))
    val kDate = hmac(("AWS4" + secretKey).getBytes(StandardCharsets.UTF_8),
      date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, "s3")
    val kSigning = hmac(kService, "aws4_request")
    val signature = hex(hmac(kSigning, stringToSign))
    s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"
  }

  /** PUT `bytes` at `p` if — and only if — no object exists there:
    * `If-None-Match: *`. Throws
    * `java.nio.file.FileAlreadyExistsException` on a taken slot (the
    * commit protocol's uniform retry signal), IOException on anything
    * else. */
  def putIfAbsent(conf: Configuration, p: HPath, bytes: Array[Byte]): Unit = {
    val endpoint = Option(conf.getTrimmed("fs.s3a.endpoint"))
      .filter(_.nonEmpty).getOrElse(throw new IllegalArgumentException(
        "graft.s3.condput needs fs.s3a.endpoint (full URL, e.g. " +
          "http://minio:9000)"))
    val base = new java.net.URI(
      if (endpoint.contains("://")) endpoint else s"https://$endpoint")
    val accessKey = conf.getTrimmed("fs.s3a.access.key", "")
    val secretKey = conf.getTrimmed("fs.s3a.secret.key", "")
    val region = conf.getTrimmed("fs.s3a.endpoint.region", "us-east-1")
    val uri = p.toUri
    val bucket = Option(uri.getAuthority).filter(_.nonEmpty)
      .getOrElse(throw new IllegalArgumentException(
        s"S3 path carries no bucket: $p"))
    val key = uri.getPath.stripPrefix("/")
    // a path-prefixed gateway endpoint (https://host/prefix) keeps its
    // prefix in both the signed canonical path and the request URL
    val prefix = Option(base.getPath).getOrElse("").stripSuffix("/")
    val canonicalPath = prefix + "/" + encodeSegment(bucket) +
      key.split("/", -1).map(encodeSegment).mkString("/", "/", "")
    val hostHeader = base.getHost +
      (if (base.getPort > 0) s":${base.getPort}" else "")
    val amzDate = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'")
      .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
    val payloadHash = hex(sha256(bytes))
    val auth = authorization("PUT", canonicalPath, hostHeader, amzDate,
      payloadHash, accessKey, secretKey, region)
    val url = java.net.URI.create(
      s"${base.getScheme}://$hostHeader$canonicalPath").toURL
    val c = url.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    try {
      c.setRequestMethod("PUT")
      c.setDoOutput(true)
      c.setFixedLengthStreamingMode(bytes.length)
      c.setRequestProperty("Host", hostHeader)
      c.setRequestProperty("If-None-Match", "*")
      c.setRequestProperty("x-amz-date", amzDate)
      c.setRequestProperty("x-amz-content-sha256", payloadHash)
      c.setRequestProperty("Authorization", auth)
      val out = c.getOutputStream
      try out.write(bytes) finally out.close()
      val code = c.getResponseCode
      if (code == 412 || code == 409)
        // 412 PreconditionFailed = the slot is taken (S3/MinIO
        // conditional-write contract); 409 = some stores' concurrent-
        // write arbitration losing side — both are the retry signal
        throw new java.nio.file.FileAlreadyExistsException(p.toString)
      if (code < 200 || code >= 300) {
        val body = Option(c.getErrorStream).map { s =>
          try new String(s.readAllBytes(), StandardCharsets.UTF_8).take(300)
          finally s.close()
        }.getOrElse("")
        throw new java.io.IOException(
          s"conditional PUT of $p failed: HTTP $code $body")
      }
      c.getInputStream.close()
    } finally c.disconnect()
  }
}

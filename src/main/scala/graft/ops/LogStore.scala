package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** The COMMIT PRIMITIVE seam of [[Manifest]]: "create this pointer file
  * iff it does not exist, atomically" — the one operation the whole
  * table format's atomicity claim rests on, isolated behind a
  * per-scheme pluggable interface exactly like Delta's `LogStore`.
  *
  * Why a seam: `FileSystem.create(path, overwrite = false)` is atomic
  * on HDFS by contract (a namenode CAS), but on S3-class object stores
  * the Hadoop connector implements it as CHECK-THEN-PUT — two writers
  * can both pass the existence check and both "succeed", and the
  * second PUT silently replaces the first: a LOST COMMIT, not a
  * conflict. The reference pipeline lives on exactly such a store
  * (`lambda_trigger.py:25-28` reads `s3://...`), so the primitive must
  * be swappable per scheme:
  *
  *  - `file:` → [[LocalLinkLogStore]] (temp-write + atomic hard link);
  *  - HDFS-like → [[HadoopCreateLogStore]] (`create(overwrite=false)`);
  *  - S3-class → a conditional-put store ([[ConditionalPutLogStore]]):
  *    the exclusivity decision moves to an operation the store really
  *    does make atomic — S3's conditional `PUT ... If-None-Match: *`
  *    (a 412 on the loser), or an external lock/CAS service (the
  *    DynamoDB table Delta's S3 multi-cluster LogStore uses).
  *
  * Selection is CONFIG-ONLY, mirroring `fs.<scheme>.impl` wiring:
  * `graft.logstore.<scheme> = <fully.qualified.ClassName>` in the
  * Hadoop configuration (settable as `spark.hadoop.graft.logstore.s3a`
  * on the Spark conf). Unconfigured schemes fall back to the defaults
  * above. Implementations must be classes with a no-arg constructor.
  */
trait LogStore {
  /** Create `path` holding exactly `bytes`, atomically, iff it does
    * not already exist. MUST throw a [[Manifest.isConflict]]-classified
    * exception when the path exists or another writer wins the race —
    * never succeed twice for one path, never leave a half-written or
    * torn pointer visible to readers. */
  def putIfAbsent(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit

  /** Release any store-side claim held for `path`, called AFTER the
    * pointer file itself has been deleted (dead-pending healing,
    * [[Manifest.commitAll]] conflict rollback, vacuum's stale-pending
    * sweep). Filesystem-arbitrated stores need nothing — the file's
    * absence IS the released state — so the default is a no-op; a
    * [[ConditionalPutLogStore]] MUST drop its reservation here or the
    * version slot stays wedged: every retried create against it
    * conflicts forever even though no pointer file exists. */
  def release(fs: FileSystem, path: Path): Unit = ()

  /** The store-side claim on `path`, as `(identity token, age millis)`
    * — `None` when no claim is held or the store does not track claims
    * (filesystem-arbitrated stores: the pointer file IS the claim).
    * The heal path uses this two ways: a claim whose pointer file has
    * been absent past the pending-grace window is a WEDGED slot (its
    * writer died between reserve and publish, or the publish response
    * was lost after the store recorded the claim) and is released; and
    * the token makes that release CONDITIONAL ([[releaseIf]]) so a
    * concurrent healer that already freed and re-claimed the slot is
    * never stomped. */
  def claimInfo(fs: FileSystem, path: Path): Option[(String, Long)] = None

  /** Release the claim on `path` only if it still carries `token`
    * (from [[claimInfo]]); returns whether THIS call freed it — false
    * when the claim was already released or re-acquired under a new
    * token (the caller must then treat the slot as owned by someone
    * livelier and back off). Stores without claim identity fall back
    * to the unconditional [[release]] and report true. */
  def releaseIf(fs: FileSystem, path: Path, token: String): Boolean = {
    release(fs, path); true
  }
}

object LogStore {

  /** Hadoop-conf key prefix: `graft.logstore.<scheme>` → LogStore FQCN. */
  val ConfPrefix = "graft.logstore."

  private val cache = new ConcurrentHashMap[String, LogStore]()

  private def instantiate(cls: String): LogStore =
    cache.computeIfAbsent(cls, c =>
      Class.forName(c).getDeclaredConstructor().newInstance()
        .asInstanceOf[LogStore])

  /** The store for `fs`'s scheme: configured class if present, else
    * the scheme defaults documented on the trait. */
  def forFs(fs: FileSystem): LogStore = {
    val scheme = fs.getUri.getScheme
    Option(fs.getConf.get(ConfPrefix + scheme)) match {
      case Some(cls) => instantiate(cls.trim)
      case None if scheme == "file" => instantiate(
        classOf[LocalLinkLogStore].getName)
      case None => instantiate(classOf[HadoopCreateLogStore].getName)
    }
  }
}

/** `file:` default — temp-write + atomic hard link: O_EXCL exclusivity
  * AND full-content visibility in one syscall. (`FileSystem.create` on
  * the local FS is itself check-then-create, unsound under a real
  * two-writer race; the link either lands whole or throws
  * `FileAlreadyExistsException`.) */
class LocalLinkLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, path: Path,
                           bytes: Array[Byte]): Unit = {
    val dir = java.nio.file.Paths.get(path.getParent.toUri.getPath)
    val tmp = java.nio.file.Files.createTempFile(dir, ".v-", ".tmp")
    try {
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.createLink(dir.resolve(path.getName), tmp)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

/** HDFS-class default — `create(path, overwrite = false)`, atomic
  * there by contract (the namenode arbitrates). NOT sound on S3-class
  * stores, where the connector emulates it as check-then-put: two
  * racers can both succeed and one commit is silently lost
  * ([[LogStoreSpec]] proves exactly this with an injected
  * check-then-put filesystem). Configure a [[ConditionalPutLogStore]]
  * there instead. */
class HadoopCreateLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, path: Path,
                           bytes: Array[Byte]): Unit = {
    val out = fs.create(path, false)
    try out.write(bytes)
    finally out.close()
  }
}

/** S3-class template: exclusivity comes from an atomic RESERVE —
  * conditional on the pointer name — that the backing store really
  * arbitrates; only the winner performs the (plain, overwriting) PUT.
  * A production S3 implementation makes [[reserve]] the conditional
  * `PUT If-None-Match: *` itself (success = reserved, HTTP 412 =
  * lost) or a DynamoDB `attribute_not_exists` put; the write below
  * then either is that PUT or follows the lock. The JVM-global
  * [[JvmCasLogStore]] instance is the single-driver concrete form:
  * correct whenever every writer shares one JVM (local[*], one Spark
  * driver with many threads — this engine's deployment unit), and the
  * injectable stand-in for the real conditional PUT in race specs. */
abstract class ConditionalPutLogStore extends LogStore {
  /** Atomically claim `path`, returning the claim's fresh identity
    * token; None = another writer holds it. The token lets every later
    * release of THIS claim be conditional ([[LogStore.releaseIf]]), so
    * no cleanup path can ever free a claim that changed hands. */
  protected def reserve(fs: FileSystem, path: Path): Option[String]

  /** Drop the claim on `path` (idempotent). Implementations MUST wire
    * this to the same arbiter [[reserve]] uses — see
    * [[LogStore.release]] for when the protocol calls it. */
  override def release(fs: FileSystem, path: Path): Unit

  override def putIfAbsent(fs: FileSystem, path: Path,
                           bytes: Array[Byte]): Unit = {
    val token = reserve(fs, path).getOrElse(
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"conditional put lost: $path already committed"))
    // reservation won: the overwrite flag is irrelevant (no other
    // writer can reach this put), and readers still never see a torn
    // pointer — the reserve gate means nobody reads before this write
    // completes its close()
    try {
      val out = fs.create(path, true)
      try out.write(bytes)
      finally out.close()
    } catch {
      // the claim must not outlive a failed publish: without this, a
      // create/write error leaves the slot reserved with NO pointer
      // file — invisible to healDeadPending (nothing to read) and so
      // wedged for every driver sharing the arbiter. The release is
      // CONDITIONAL on our own token: if the create stalled past the
      // pending grace and a wedged-slot healer already freed the claim
      // (and a new writer re-acquired it), an unconditional release
      // here would free the LIVE writer's claim and reopen the
      // double-publish window — the token makes that a no-op. A writer
      // that dies OUTRIGHT in this window cannot run this handler —
      // that case is the wedged-slot heal's job (claimInfo age past
      // the pending grace window).
      case t: Throwable =>
        try releaseIf(fs, path, token)
        catch { case u: Throwable => t.addSuppressed(u) }
        throw t
    }
  }
}

/** Process-global CAS registry keyed by fully-QUALIFIED pointer URI
  * (qualification makes the reserve and release sides agree even when
  * one caller passes a scheme-less path and the other a listing's
  * qualified one). Each claim carries an identity token and its birth
  * time, backing [[LogStore.claimInfo]]/[[LogStore.releaseIf]]: the
  * heal path can free a wedged claim (pointer file absent past the
  * grace window) and can never stomp a claim that was re-acquired by a
  * healthier writer in the meantime (token mismatch → no-op, via the
  * atomic two-arg `remove`). */
object JvmCasLogStore {
  private[ops] final case class Claim(token: String, sinceMillis: Long)
  private[ops] val claimed = new ConcurrentHashMap[String, Claim]()
}

class JvmCasLogStore extends ConditionalPutLogStore {
  import JvmCasLogStore._
  private def key(fs: FileSystem, path: Path): String =
    fs.makeQualified(path).toUri.toString
  override protected def reserve(fs: FileSystem,
                                 path: Path): Option[String] = {
    val c = Claim(java.util.UUID.randomUUID().toString,
      System.currentTimeMillis())
    if (claimed.putIfAbsent(key(fs, path), c) == null) Some(c.token)
    else None
  }
  override def release(fs: FileSystem, path: Path): Unit = {
    claimed.remove(key(fs, path)); ()
  }
  override def releaseIf(fs: FileSystem, path: Path,
                         token: String): Boolean = {
    val k = key(fs, path)
    Option(claimed.get(k)).filter(_.token == token)
      .exists(c => claimed.remove(k, c))
  }
  override def claimInfo(fs: FileSystem,
                         path: Path): Option[(String, Long)] =
    Option(claimed.get(key(fs, path)))
      .map(c => (c.token, System.currentTimeMillis() - c.sinceMillis))
}

/** A REAL multi-driver conditional-put arbiter over HTTP — the
  * production form of [[ConditionalPutLogStore]] for S3-class tables,
  * with zero SDK dependency (`java.net.HttpURLConnection` only, so it
  * is never "falling back" on a missing client library).
  *
  * reserve = `PUT <endpoint>/<url-encoded qualified pointer URI>` with
  * `If-None-Match: *` — the S3 conditional-write dialect (RFC 7232 on
  * any store): 200/201/204 = claimed, 412 Precondition Failed =
  * another writer holds it. release = `DELETE` on the same key
  * (404 = already free). Point
  * `graft.logstore.http.endpoint` (Hadoop conf, settable as
  * `spark.hadoop.graft.logstore.http.endpoint`) at an S3 bucket
  * prefix, an S3 mock (MinIO/LocalStack), or any sidecar speaking the
  * dialect, and wire the table scheme with
  * `graft.logstore.s3a = graft.ops.HttpCasLogStore` — config-only,
  * exactly like `fs.<scheme>.impl`.
  *
  * Every non-{claimed, 412, 404} response and every transport failure
  * THROWS: "cannot arbitrate" must never silently become "claimed" (a
  * fake claim is a lost commit on the next real race) — the same
  * fail-loud contract as the marker-visibility probe. Reference
  * substrate: the reference pipeline's own commit point lives on such
  * a store (`lambda_trigger.py:25-28`).
  *
  * == Tested dialect — the compatibility contract ==
  *
  * No S3-mock service exists in this build environment, so the arbiter
  * is proven against an in-process stand-in speaking exactly this
  * dialect (LogStoreSpec; the gated integration spec below runs the
  * same assertions against a real endpoint when one is configured). A
  * deployment endpoint MUST honor:
  *
  *  - `PUT <key>` + `If-None-Match: *`, body = claim token:
  *    200/201/204 = claimed, **412** = held (S3's conditional-write
  *    code; an endpoint answering 409 instead needs a shim — 409 here
  *    throws, by the fail-loud rule);
  *  - `GET <key>`: 200 + stored body + `Last-Modified`, 404 when free
  *    (age falls back to 0 without the header — wedged-slot healing
  *    then never triggers, a safe degradation);
  *  - `DELETE <key>`: 200/202/204, 404 when already free;
  *  - `DELETE <key>` + `If-Match: <token>`: as above plus **412** when
  *    the stored body no longer equals the token (match on the VERBATIM
  *    body, not an ETag hash). Stores without conditional DELETE
  *    (plain S3) degrade to the unconditional delete — the healer-race
  *    guard then rests on the mtime/len re-check in
  *    [[Manifest]]'s heal path alone.
  *
  * To run the integration spec against a real endpoint:
  * `SPARK_GRAFT_HTTP_CAS_ENDPOINT=http://host:port/prefix sbt test`
  * (LogStoreSpec gates on the variable and skips otherwise). */
class HttpCasLogStore extends ConditionalPutLogStore {

  private def open(fs: FileSystem, path: Path, method: String)
      : java.net.HttpURLConnection = {
    val base = Option(fs.getConf.get(HttpCasLogStore.EndpointKey))
      .getOrElse(throw new IllegalStateException(
        s"${HttpCasLogStore.EndpointKey} is not set — the HTTP CAS " +
          "arbiter needs an endpoint"))
    val enc = java.net.URLEncoder.encode(
      fs.makeQualified(path).toUri.toString, "UTF-8")
    val url = java.net.URI.create(s"${base.stripSuffix("/")}/$enc").toURL
    val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    c.setConnectTimeout(10000)
    c.setReadTimeout(10000)
    c.setRequestMethod(method)
    c
  }

  override protected def reserve(fs: FileSystem,
                                 path: Path): Option[String] = {
    // the claim BODY is a per-writer identity token: claimInfo reads
    // it back, and releaseIf matches on it so a healer can never free
    // a claim that a different writer re-acquired in the meantime
    val token = java.util.UUID.randomUUID().toString
    val body = token.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val c = open(fs, path, "PUT")
    c.setRequestProperty("If-None-Match", "*")
    c.setDoOutput(true)
    c.setFixedLengthStreamingMode(body.length)
    try {
      val out = c.getOutputStream
      try out.write(body) finally out.close()
      c.getResponseCode match {
        case 200 | 201 | 204 => Some(token)
        case 412 => None
        case other => throw new java.io.IOException(
          s"HTTP CAS arbiter returned $other for reserve of $path")
      }
    } finally c.disconnect()
  }

  override def release(fs: FileSystem, path: Path): Unit = {
    val c = open(fs, path, "DELETE")
    try c.getResponseCode match {
      case 200 | 202 | 204 | 404 => ()
      case other => throw new java.io.IOException(
        s"HTTP CAS arbiter returned $other for release of $path")
    } finally c.disconnect()
  }

  /** GET on the claim key: 200 → `(body token, now − Last-Modified)`;
    * 404 → no claim. A store that omits `Last-Modified` reports age 0
    * — conservatively NEVER old enough for the wedged-slot heal, since
    * a fabricated age could free a live writer's claim. */
  override def claimInfo(fs: FileSystem,
                         path: Path): Option[(String, Long)] = {
    val c = open(fs, path, "GET")
    try c.getResponseCode match {
      case 200 =>
        val body = new String(c.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val lm = c.getLastModified // 0 when the header is absent
        val age =
          if (lm == 0L) 0L
          else math.max(0L, System.currentTimeMillis() - lm)
        Some((body, age))
      case 404 => None
      case other => throw new java.io.IOException(
        s"HTTP CAS arbiter returned $other for claimInfo of $path")
    } finally c.disconnect()
  }

  /** `DELETE` with `If-Match: <token>`: 412 = the claim changed hands
    * since [[claimInfo]] (another healer freed it and a new writer
    * re-reserved) — a successful no-op reported false, exactly the
    * conditional-release contract. 404 = already free (also false:
    * this call freed nothing). */
  override def releaseIf(fs: FileSystem, path: Path,
                         token: String): Boolean = {
    val c = open(fs, path, "DELETE")
    c.setRequestProperty("If-Match", token)
    try c.getResponseCode match {
      case 200 | 202 | 204 => true
      case 404 | 412 => false
      case other => throw new java.io.IOException(
        s"HTTP CAS arbiter returned $other for releaseIf of $path")
    } finally c.disconnect()
  }
}

object HttpCasLogStore {
  /** Hadoop-conf key naming the arbiter's base URL. */
  val EndpointKey = "graft.logstore.http.endpoint"
}

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
  /** Atomically claim `path`; false = another writer holds it. */
  protected def reserve(fs: FileSystem, path: Path): Boolean

  /** Drop the claim on `path` (idempotent). Implementations MUST wire
    * this to the same arbiter [[reserve]] uses — see
    * [[LogStore.release]] for when the protocol calls it. */
  override def release(fs: FileSystem, path: Path): Unit

  override def putIfAbsent(fs: FileSystem, path: Path,
                           bytes: Array[Byte]): Unit = {
    if (!reserve(fs, path))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"conditional put lost: $path already committed")
    // reservation won: the overwrite flag is irrelevant (no other
    // writer can reach this put), and readers still never see a torn
    // pointer — the reserve gate means nobody reads before this write
    // completes its close()
    val out = fs.create(path, true)
    try out.write(bytes)
    finally out.close()
  }
}

/** Process-global CAS registry keyed by fully-QUALIFIED pointer URI
  * (qualification makes the reserve and release sides agree even when
  * one caller passes a scheme-less path and the other a listing's
  * qualified one). */
object JvmCasLogStore {
  private[ops] val claimed = ConcurrentHashMap.newKeySet[String]()
}

class JvmCasLogStore extends ConditionalPutLogStore {
  override protected def reserve(fs: FileSystem, path: Path): Boolean =
    JvmCasLogStore.claimed.add(fs.makeQualified(path).toUri.toString)
  override def release(fs: FileSystem, path: Path): Unit =
    JvmCasLogStore.claimed.remove(fs.makeQualified(path).toUri.toString)
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
  * a store (`lambda_trigger.py:25-28`). */
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

  override protected def reserve(fs: FileSystem, path: Path): Boolean = {
    val c = open(fs, path, "PUT")
    c.setRequestProperty("If-None-Match", "*")
    c.setDoOutput(true)
    c.setFixedLengthStreamingMode(0)
    try {
      c.getOutputStream.close()
      c.getResponseCode match {
        case 200 | 201 | 204 => true
        case 412 => false
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
}

object HttpCasLogStore {
  /** Hadoop-conf key naming the arbiter's base URL. */
  val EndpointKey = "graft.logstore.http.endpoint"
}

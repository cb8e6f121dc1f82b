package graft.ops

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, TimeUnit}

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

import graft.SparkSpec

/** An S3A-faithful `create(overwrite = false)`: CHECK-THEN-PUT with an
  * interleave window between the existence check and an OVERWRITING
  * put — exactly the non-atomicity that makes the HDFS-default commit
  * primitive unsound on object stores. The window only opens for
  * version-pointer names, and only while a test holds the barrier, so
  * every other FS operation behaves normally. */
abstract class CheckThenPutFileSystem extends RawLocalFileSystem {

  /** The check-then-put emulation, shared by every create overload
    * (RawLocalFileSystem routes different call chains through
    * different public variants — all must exhibit the race). */
  private def racily(f: Path, overwrite: Boolean)
                    (put: Boolean => FSDataOutputStream): FSDataOutputStream =
    if (f.getName.matches("v\\d{8}")) {
      if (CheckThenPutFileSystem.failPointerCreates)
        throw new java.io.IOException(s"injected create failure: $f")
      if (!overwrite) {
        if (exists(f))
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
        CheckThenPutFileSystem.interleave()
        put(true)
      } else put(overwrite)
    } else put(overwrite)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    racily(f, overwrite)(ow =>
      super.create(f, permission, ow, bufferSize, replication, blockSize,
        progress))

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    racily(f, overwrite)(ow =>
      super.create(f, ow, bufferSize, replication, blockSize, progress))
}

object CheckThenPutFileSystem {
  @volatile var barrier: Option[CyclicBarrier] = None
  /** Failpoint: every version-pointer create throws (the "reserve won,
    * publish failed" crash window of [[ConditionalPutLogStore]]). */
  @volatile var failPointerCreates: Boolean = false
  private def interleave(): Unit = barrier.foreach { b =>
    // both racers pass the existence check before either puts; a lone
    // writer (barrier unset or partner absent) proceeds after timeout
    try b.await(120, TimeUnit.SECONDS) catch { case _: Exception => () }
  }
}

/** The naive-primitive scheme: no logstore configured, so commits run
  * through [[HadoopCreateLogStore]] — sound on HDFS, lossy here. */
class RacyNaiveFileSystem extends CheckThenPutFileSystem {
  override def getScheme: String = "racyfs"
  override def getUri: URI = URI.create("racyfs:///")
}

/** The same lossy store, but with a conditional-put LogStore
  * configured for its scheme — the S3 `If-None-Match` shape. */
class RacyCasFileSystem extends CheckThenPutFileSystem {
  override def getScheme: String = "racycas"
  override def getUri: URI = URI.create("racycas:///")
}

/** Lossy store arbitrated by the REAL HTTP conditional-put LogStore
  * (against a local stand-in server speaking the `If-None-Match`
  * dialect). */
class HttpCasFileSystem extends CheckThenPutFileSystem {
  override def getScheme: String = "httpcas"
  override def getUri: URI = URI.create("httpcas:///")
}

/** An in-memory `If-None-Match: *` object store on localhost — the
  * stand-in for S3's conditional write (or a MinIO/LocalStack mock).
  * PUT WITHOUT the precondition header overwrites unconditionally,
  * so a store that dropped the header would silently lose commits —
  * the spec proves the LogStore sends it. */
object CasStandInServer {
  /** A stored claim: the PUT body (the writer's identity token) and
    * its server-side mtime, surfaced as `Last-Modified` on GET. */
  final case class Obj(body: String, mtimeMillis: Long)

  private val HttpDate = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
    .withZone(java.time.ZoneId.of("GMT"))

  def start(): (com.sun.net.httpserver.HttpServer,
                java.util.concurrent.ConcurrentHashMap[String, Obj]) = {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, Obj]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/locks",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val key = ex.getRequestURI.getRawPath.stripPrefix("/locks/")
        ex.getRequestMethod match {
          case "PUT" =>
            val body = new String(ex.getRequestBody.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            val conditional =
              Option(ex.getRequestHeaders.getFirst("If-None-Match"))
                .contains("*")
            val obj = Obj(body, System.currentTimeMillis())
            if (!conditional) {
              objects.put(key, obj); ex.sendResponseHeaders(200, -1)
            } else if (objects.putIfAbsent(key, obj) == null)
              ex.sendResponseHeaders(200, -1)
            else ex.sendResponseHeaders(412, -1)
          case "GET" =>
            objects.get(key) match {
              case null => ex.sendResponseHeaders(404, -1)
              case o =>
                val bytes =
                  o.body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                ex.getResponseHeaders.set("Last-Modified",
                  HttpDate.format(java.time.Instant.ofEpochMilli(o.mtimeMillis)))
                ex.sendResponseHeaders(200,
                  if (bytes.isEmpty) -1 else bytes.length)
                if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
            }
          case "DELETE" =>
            Option(ex.getRequestHeaders.getFirst("If-Match")) match {
              case Some(token) =>
                // conditional release: match on the VERBATIM stored
                // body (the dialect HttpCasLogStore documents)
                objects.get(key) match {
                  case null => ex.sendResponseHeaders(404, -1)
                  case o if o.body != token => ex.sendResponseHeaders(412, -1)
                  case o =>
                    if (objects.remove(key, o)) ex.sendResponseHeaders(204, -1)
                    else ex.sendResponseHeaders(412, -1)
                }
              case None =>
                if (objects.remove(key) != null)
                  ex.sendResponseHeaders(204, -1)
                else ex.sendResponseHeaders(404, -1)
            }
          case _ => ex.sendResponseHeaders(405, -1)
        }
        ex.close()
      })
    server.start()
    (server, objects)
  }
}

/** Proves the commit primitive's substrate contract (VERDICT r8 #1):
  * on a store whose `create(overwrite=false)` is check-then-put, the
  * HDFS-default primitive lets two writers both "win" and silently
  * drops one commit; routing the SAME table over a conditional-put
  * [[LogStore]] turns that lost write into a clean optimistic-
  * concurrency conflict — which [[Manifest.withConflictRetry]]
  * resolves by re-planning, and which (since round 14) the readless
  * append rebase consumes internally so both racing appends land. */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  private val hconf = spark.sparkContext.hadoopConfiguration
  hconf.set("fs.racyfs.impl", classOf[RacyNaiveFileSystem].getName)
  hconf.set("fs.racycas.impl", classOf[RacyCasFileSystem].getName)
  // config-only remedy, exactly how a real deployment would wire s3a:
  // spark.hadoop.graft.logstore.s3a=<conditional-put impl>
  hconf.set(LogStore.ConfPrefix + "racycas", classOf[JvmCasLogStore].getName)

  private def base = spark.range(1, 61)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" % 3).as("p"))
  private def batchA = Seq((200L, 1.0, 0L), (201L, 1.0, 1L)).toDF("k", "v", "p")
  private def batchB = Seq((300L, 2.0, 0L), (301L, 2.0, 2L)).toDF("k", "v", "p")

  /** Run both appends concurrently; return each thread's failure. */
  private def race(dir: String): Seq[Option[Throwable]] = {
    val outcomes = Array[Option[Throwable]](None, None)
    val threads = Seq(batchA, batchB).zipWithIndex.map { case (b, i) =>
      new Thread(() => {
        try Manifest.append(spark, dir, b, "p")
        catch { case t: Throwable => outcomes(i) = Some(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    outcomes.toSeq
  }

  test("check-then-put store + naive primitive: both writers 'win', one commit silently lost") {
    val dir = "racyfs://" + Files.createTempDirectory("graft-racy").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    CheckThenPutFileSystem.barrier = Some(new CyclicBarrier(2))
    try {
      val outcomes = race(dir)
      // the defect on display: NEITHER writer sees a conflict...
      assert(outcomes.forall(_.isEmpty),
        s"naive primitive should lose silently, got $outcomes")
      // ...yet only one of the two committed batches survives
      assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
      val ks = Manifest.read(spark, dir).select("k").as[Long].collect().toSet
      val aIn = ks.contains(200L)
      val bIn = ks.contains(300L)
      assert(aIn != bIn,
        s"exactly one batch must survive the lost-commit race (a=$aIn b=$bIn)")
      assert(ks.size == 62)
    } finally CheckThenPutFileSystem.barrier = None
  }

  test("same store + conditional-put LogStore: clean conflict at the store, both appends land") {
    val dir = "racycas://" + Files.createTempDirectory("graft-cas").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    // the clean-conflict SURFACE, pinned at the store itself (the core
    // claim of this spec): the second create of a taken slot throws a
    // retryable conflict, never silently wins
    val fs = new Path(dir).getFileSystem(hconf)
    val store = LogStore.forFs(fs)
    val probe = new Path(dir, "_probe/slot")
    store.putIfAbsent(fs, probe, "x".getBytes("UTF-8"))
    val clash = intercept[Throwable] {
      store.putIfAbsent(fs, probe, "y".getBytes("UTF-8"))
    }
    assert(Manifest.isConflict(clash),
      s"the conditional put must surface a retryable conflict, got $clash")
    // through the append API the same race now lands BOTH writers: the
    // store's clean conflict feeds the round-14 readless append rebase,
    // which re-links the loser's staged batch onto the winner's tip —
    // contrast with the naive primitive above, which loses one batch
    // SILENTLY on the same interleaving
    val outcomes = race(dir)
    assert(outcomes.forall(_.isEmpty),
      s"both racing appends must land via rebase, got $outcomes")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
    val ks = Manifest.read(spark, dir).select("k").as[Long].collect().toSet
    assert(Set(200L, 201L, 300L, 301L).subsetOf(ks) && ks.size == 64,
      "both batches must be present")
  }

  test("HttpCasLogStore: config-only wiring, clean conflicts, healed slots release over HTTP") {
    val (server, objects) = CasStandInServer.start()
    try {
      // a real deployment's exact wiring, on a scheme whose native
      // create is lossy check-then-put:
      //   spark.hadoop.graft.logstore.s3a=graft.ops.HttpCasLogStore
      //   spark.hadoop.graft.logstore.http.endpoint=<arbiter url>
      hconf.set("fs.httpcas.impl", classOf[HttpCasFileSystem].getName)
      hconf.set(LogStore.ConfPrefix + "httpcas",
        classOf[HttpCasLogStore].getName)
      hconf.set(HttpCasLogStore.EndpointKey,
        s"http://127.0.0.1:${server.getAddress.getPort}/locks")

      val dir = "httpcas://" +
        Files.createTempDirectory("graft-httpcas").toString + "/tbl"
      Manifest.create(spark, dir, base, "p")
      assert(!objects.isEmpty, "the commit must have claimed its key remotely")

      // the HTTP arbiter surfaces a taken slot as a clean retryable
      // conflict (pinned at the store; the dialect test below covers
      // heal/release)
      val hfs = new Path(dir).getFileSystem(hconf)
      val hstore = LogStore.forFs(hfs)
      val probe = new Path(dir, "_probe/slot")
      hstore.putIfAbsent(hfs, probe, "x".getBytes("UTF-8"))
      val clash = intercept[Throwable] {
        hstore.putIfAbsent(hfs, probe, "y".getBytes("UTF-8"))
      }
      assert(Manifest.isConflict(clash),
        s"the HTTP conditional put must conflict cleanly, got $clash")
      // two writers race the same slot through the HTTP arbiter: the
      // loser's clean conflict feeds the readless append rebase, so
      // BOTH land with nothing lost
      CheckThenPutFileSystem.barrier = Some(new CyclicBarrier(2))
      val outcomes = try race(dir)
      finally CheckThenPutFileSystem.barrier = None
      assert(outcomes.forall(_.isEmpty),
        s"both racing appends must land via rebase, got $outcomes")
      assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L))
      assert(Manifest.read(spark, dir).count() == 64)

      // crashed multi-commit: healing must DELETE the remote claim or
      // the slot wedges across every driver sharing the arbiter
      Manifest.commitAllCrashAfter = Some(1)
      try intercept[RuntimeException] {
        Manifest.commitAll(spark,
          Seq(StagedWrite(dir, batchA, "p")), s"$dir/../_txns")
      } finally Manifest.commitAllCrashAfter = None
      val keysAfterCrash = objects.size()
      hconf.setLong("graft.manifest.pendingGraceMillis", 0L)
      try Manifest.append(spark, dir,
        Seq((400L, 9.0, 0L)).toDF("k", "v", "p"), "p")
      finally hconf.unset("graft.manifest.pendingGraceMillis")
      assert(Manifest.versions(spark, dir) == Seq(1L, 2L, 3L, 4L))
      assert(objects.size() == keysAfterCrash,
        "healing must release the dead claim before re-claiming the slot")
    } finally server.stop(0)
  }

  test("publish failure between reserve and pointer create releases the claim") {
    val dir = "racycas://" +
      Files.createTempDirectory("graft-casrel").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    // the writer survives its fs.create error (no crash): the catch in
    // ConditionalPutLogStore.putIfAbsent must drop the reservation, or
    // the slot is wedged for every driver sharing the arbiter
    CheckThenPutFileSystem.failPointerCreates = true
    try intercept[java.io.IOException] {
      Manifest.append(spark, dir, batchA, "p")
    } finally CheckThenPutFileSystem.failPointerCreates = false
    // no healing, no grace window: the very next append claims the slot
    Manifest.append(spark, dir, batchA, "p")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    assert(Manifest.read(spark, dir).count() == 62)
  }

  test("writer death between reserve and publish: wedged slot heals after grace") {
    val dir = "racycas://" +
      Files.createTempDirectory("graft-caswedge").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    // simulate the crash shape the in-process failpoint cannot: the
    // writer reserved v2 and died before any pointer file existed —
    // nothing on disk for grace-window healing to read
    val fs = new Path(dir).getFileSystem(hconf)
    val target = fs.makeQualified(new Path(dir, "_versions/v00000002"))
    JvmCasLogStore.claimed.put(target.toUri.toString,
      JvmCasLogStore.Claim("dead-writer-token",
        System.currentTimeMillis() - 60000))
    // inside the grace window the claim is honored (its writer might
    // be alive mid-publish): the append surfaces a bounded conflict
    hconf.setLong("graft.manifest.pendingGraceMillis", 3600 * 1000L)
    hconf.setLong("graft.manifest.pendingWaitMillis", 50L)
    try {
      intercept[Exception] { Manifest.append(spark, dir, batchA, "p") }
      // past the grace window the claim can never complete (no pointer
      // file will ever appear): the next writer releases it and wins
      hconf.setLong("graft.manifest.pendingGraceMillis", 1000L)
      Manifest.append(spark, dir, batchA, "p")
    } finally {
      hconf.unset("graft.manifest.pendingGraceMillis")
      hconf.unset("graft.manifest.pendingWaitMillis")
    }
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    // the winner holds the slot under its OWN claim now
    val now = Option(JvmCasLogStore.claimed.get(target.toUri.toString))
    assert(now.exists(_.token != "dead-writer-token"))
  }

  test("paused healer: a dead-pending heal cannot remove a re-claimed slot's commit") {
    val dir = "racycas://" +
      Files.createTempDirectory("graft-caspause").toString + "/tbl"
    Manifest.create(spark, dir, base, "p")
    val fs = new Path(dir).getFileSystem(hconf)
    val target = fs.makeQualified(new Path(dir, "_versions/v00000002"))
    // a crashed multi-commit writer left a stale PENDING pointer (its
    // parent marker never appeared) plus its store-side claim
    val out = fs.create(target, true)
    out.write(("m-dead-manifest\nmtxn:file:/graft-never-appears")
      .getBytes("UTF-8"))
    out.close()
    fs.setTimes(target, System.currentTimeMillis() - 60000, -1)
    JvmCasLogStore.claimed.put(target.toUri.toString,
      JvmCasLogStore.Claim("dead-writer-token",
        System.currentTimeMillis() - 60000))
    // healer A captured the dead claim's token, then PAUSED (GC stall,
    // scheduler hiccup) for longer than the whole heal+recommit cycle
    val store = new JvmCasLogStore
    val pausedToken = store.claimInfo(fs, target).get._1
    hconf.setLong("graft.manifest.pendingGraceMillis", 1000L)
    try {
      // healer B + writer C in one: the next append heals the slot —
      // on a claim-arbitrated store that is ONLY the token-conditional
      // claim release, never a pointer-file delete — then re-claims
      // and publishes v2 over the stale pending file
      Manifest.append(spark, dir, batchA, "p")
    } finally hconf.unset("graft.manifest.pendingGraceMillis")
    assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
    val liveClaim = Option(JvmCasLogStore.claimed.get(target.toUri.toString))
    assert(liveClaim.exists(_.token != "dead-writer-token"))
    // healer A resumes: its entire remaining heal step is the
    // CONDITIONAL claim release — the stale token must free nothing
    // and touch no file, so C's commit survives
    assert(!store.releaseIf(fs, target, pausedToken),
      "a stale heal token must report nothing freed")
    assert(Option(JvmCasLogStore.claimed.get(target.toUri.toString))
      == liveClaim,
      "the re-claimed slot's claim must survive the resumed healer")
    assert(fs.exists(target) && Manifest.versions(spark, dir) == Seq(1L, 2L),
      "the re-claimed slot's commit must survive the resumed healer")
    assert(Manifest.read(spark, dir).count() == 62)
  }

  test("releaseIf: a stale heal token never frees a re-acquired claim") {
    val fs = new Path(Files.createTempDirectory("graft-tok").toString)
      .getFileSystem(hconf)
    val store = new JvmCasLogStore
    val p = new Path(Files.createTempDirectory("graft-tok2").toString,
      "v00000009")
    store.putIfAbsent(fs, p, "ptr".getBytes)
    val tok = store.claimInfo(fs, p).get._1
    // healer B raced: its captured token is stale — must be a no-op
    store.releaseIf(fs, p, "some-older-token")
    assert(store.claimInfo(fs, p).exists(_._1 == tok),
      "stale token must not free the live claim")
    store.releaseIf(fs, p, tok)
    assert(store.claimInfo(fs, p).isEmpty)
  }

  test("HttpCasLogStore: GET/If-Match dialect — wedged remote claim heals, stale release no-ops") {
    val (server, objects) = CasStandInServer.start()
    try {
      hconf.set("fs.httpcas.impl", classOf[HttpCasFileSystem].getName)
      hconf.set(LogStore.ConfPrefix + "httpcas",
        classOf[HttpCasLogStore].getName)
      hconf.set(HttpCasLogStore.EndpointKey,
        s"http://127.0.0.1:${server.getAddress.getPort}/locks")
      val dir = "httpcas://" +
        Files.createTempDirectory("graft-httpwedge").toString + "/tbl"
      Manifest.create(spark, dir, base, "p")
      // wedge v2 remotely: claim stored server-side, pointer file never
      // written (writer died, or its 2xx response was lost in transit)
      val fs = new Path(dir).getFileSystem(hconf)
      val target = fs.makeQualified(new Path(dir, "_versions/v00000002"))
      val key = java.net.URLEncoder.encode(target.toUri.toString, "UTF-8")
      objects.put(key, CasStandInServer.Obj("dead-token",
        System.currentTimeMillis() - 60000))
      hconf.setLong("graft.manifest.pendingGraceMillis", 2000L)
      try Manifest.append(spark, dir, batchA, "p")
      finally hconf.unset("graft.manifest.pendingGraceMillis")
      assert(Manifest.versions(spark, dir) == Seq(1L, 2L))
      assert(!objects.containsKey(key) ||
        objects.get(key).body != "dead-token",
        "the dead remote claim must have been released")

      // the conditional-release half of the dialect, end to end
      val store = new HttpCasLogStore
      val p2 = fs.makeQualified(new Path(dir, "_versions/v00000077"))
      store.putIfAbsent(fs, p2, "ptr".getBytes)
      val tok = store.claimInfo(fs, p2).get._1
      store.releaseIf(fs, p2, "stale-token") // 412 server-side: no-op
      assert(store.claimInfo(fs, p2).exists(_._1 == tok))
      store.releaseIf(fs, p2, tok)
      assert(store.claimInfo(fs, p2).isEmpty)
    } finally server.stop(0)
  }

  test("HttpCasLogStore end-to-end against a REAL arbiter (env-gated integration)") {
    // dialect drift (S3 412-vs-409, ETag semantics) can only be caught
    // against a real store; this build environment has none, so the
    // spec gates on an operator-provided endpoint and otherwise
    // records the stand-in as the tested contract (class Scaladoc).
    val ep = sys.env.get("SPARK_GRAFT_HTTP_CAS_ENDPOINT")
    assume(ep.isDefined, "SPARK_GRAFT_HTTP_CAS_ENDPOINT unset — core " +
      "dialect proven against the in-process stand-in only")
    val fs = new Path(Files.createTempDirectory("graft-realcas").toString)
      .getFileSystem(hconf)
    fs.getConf.set(HttpCasLogStore.EndpointKey, ep.get)
    val store = new HttpCasLogStore
    val target = new Path(
      Files.createTempDirectory("graft-realcas-t").toString,
      s"v-${java.util.UUID.randomUUID()}")
    store.putIfAbsent(fs, target, "one".getBytes)
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      store.putIfAbsent(fs, target, "two".getBytes)
    }
    assert(store.claimInfo(fs, target).isDefined)
    store.release(fs, target)
    assert(store.claimInfo(fs, target).isEmpty)
  }

  test("default store resolution: file -> hard-link, others -> hdfs-create, conf wins") {
    val localFs = new Path(Files.createTempDirectory("graft-ls").toString)
      .getFileSystem(hconf)
    assert(LogStore.forFs(localFs).isInstanceOf[LocalLinkLogStore])
    val racy = new Path("racyfs:///tmp").getFileSystem(hconf)
    assert(LogStore.forFs(racy).isInstanceOf[HadoopCreateLogStore])
    val cas = new Path("racycas:///tmp").getFileSystem(hconf)
    assert(LogStore.forFs(cas).isInstanceOf[JvmCasLogStore])
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

/** Benchmark main (driver contract): runs the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with total + per-query
  * seconds. Queries are materialized via the `noop` datasource so every
  * column is computed (a bare `.count()` would let Catalyst prune the
  * whole projection away and benchmark nothing).
  *
  * == Contention-robust protocol (round 7) ==
  *
  * BENCH_r06 (91 s vs a 17 s baseline) was a contaminated sample that
  * needed a judge re-run to interpret; a gate metric must be readable on
  * its own. This host's noise was characterized empirically before
  * choosing the protocol (all data in BASELINE.md §"Bench protocol"):
  *
  *  - The noise is EXTERNAL and invisible in-VM: `ps` shows nothing,
  *    `/proc/stat` steal is usually near zero, yet a fixed 32-thread CPU
  *    loop (the calibration probe) stretches 2-50× for minutes at a
  *    time, then returns to ~0.03-0.07 s. Quiet and loud PERIODS
  *    alternate on a minutes timescale.
  *  - Noise is strictly ONE-SIDED (it only ever adds time), so the
  *    per-query MINIMUM across passes converges on the quiet truth as
  *    soon as the run spans one quiet window — measured: a run whose
  *    first 5 passes were 3-35× inflated still reported per-query mins
  *    within 10% of the quiet-period medians.
  *  - A 50 ms probe cannot certify the INTERIOR of a multi-second query
  *    (bursts are intermittent), so a "median of calibration-quiet
  *    samples" can still be polluted — observed: a pass with ~0.1 s
  *    calibrations carried 5× inflated query times. That rules out the
  *    quiet-median as the headline.
  *
  * Therefore:
  *  - headline per-query value = MIN across passes;
  *  - every sample is BRACKETED by probes (calibration loop + steal
  *    snapshot, one probe shared between adjacent queries); a PASS is
  *    "quiet" when every probe in it is ≤ `SPARK_GRAFT_BENCH_QUIET_CALIB`
  *    (absolute, default 0.08 s ≈ 2× the quiet-period calibration);
  *  - passes run adaptively: `SPARK_GRAFT_BENCH_PASSES` (default 7)
  *    sweeps minimum, continuing up to `SPARK_GRAFT_BENCH_MAX_PASSES`
  *    (default 15) until at least one fully-quiet pass has been seen —
  *    the run hunts for a quiet window instead of hoping it started in
  *    one;
  *  - the JSON carries `calib` (best/median/worst + fraction of quiet
  *    probes), `quiet_passes`, `steal_max_frac`, per-pass `loadavg`, and
  *    per-query `[min, max, median, nSamples]` spreads. A run that never
  *    found a quiet window says so (`quiet_passes: 0`, stretched calib
  *    median) — under SUSTAINED saturation no timing protocol can
  *    recover quiet numbers, and the artifact must flag itself rather
  *    than mislead.
  */
object Bench {
  /** Median of the samples; for an even count the lower-middle (we never
    * interpolate — a real observed duration beats a synthetic midpoint). */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  /** Sink defeating dead-code elimination of the calibration loop. */
  private val calibSink = new AtomicLong(0L)

  private val CalibThreads = 32
  private val CalibIters   = 8000000L // ~30-70 ms wall on this box, quiet

  /** Fixed CPU-bound workload: `CalibThreads` threads each run a constant
    * number of xorshift64* iterations; returns wall seconds. Saturates
    * the 32 logical cores for a few tens of ms, so external load during
    * the window shows up as a proportional stretch (a single-threaded
    * probe would land on a free core and miss it). */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to CalibThreads).map { i =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L * i
        var n = 0L
        while (n < CalibIters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          n += 1
        }
        calibSink.addAndGet(x)
      })
      t.setDaemon(true)
      t.start()
      t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative (steal, total) jiffies from /proc/stat's aggregate cpu
    * line; (0, 0) outside Linux (steal check then auto-passes). */
  private def readSteal(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    } catch { case _: Throwable => (0L, 0L) }

  /** 1-minute load average, or -1 outside Linux. */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** One quietness probe: calibration time + steal/total snapshot +
    * an fsync round-trip. The CPU calibration loop cannot flag
    * FILESYSTEM stalls (dirty-page writeback storms, a co-tenant's
    * fsync queue) — exactly the noise mode that inflates the
    * commit-bound `man_*` lifecycle queries while every CPU probe
    * reads quiet (round-15 variance budget). A 4 KB create+fsync+
    * delete round-trip measures that axis directly; its spread ships
    * in the JSON (`fsync_calib`) so the artifact self-describes. */
  private case class Probe(calib: Double, steal: Long, total: Long,
                           fsync: Double)
  private def probe(): Probe = {
    val (st, tot) = readSteal()
    Probe(calibrate(), st, tot, fsyncProbe())
  }

  private def fsyncProbe(): Double = {
    val t0 = System.nanoTime()
    try {
      val f = java.io.File.createTempFile("graft-fsync", ".probe")
      val ch = java.nio.channels.FileChannel.open(f.toPath,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        ch.write(java.nio.ByteBuffer.wrap(new Array[Byte](4096)))
        ch.force(true)
      } finally ch.close()
      f.delete()
    } catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
  }

  /** One timed query sample with its bracketing probes. */
  private case class Sample(sec: Double, before: Probe, after: Probe) {
    def stealFrac: Double = {
      val dTot = after.total - before.total
      if (dTot <= 0) 0.0 else (after.steal - before.steal).toDouble / dTot
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val minPasses = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "7").toInt
    val maxPasses =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PASSES", "15").toInt
    val quietCalib =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_CALIB", "0.08").toDouble
    val stealTol =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_STEAL_TOL", "0.03").toDouble
    // optional comma-separated subset (e.g. the 5 heaviest at sf1 for the
    // BASELINE.md scaling point); default = the full headline list
    val benchList: Seq[String] = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.benchQueries)
    val spark = Spark.session(appName = "graft-bench")
    // ERROR, not WARN: stray log lines interleaved with the JSON result
    // line can break the driver's parse (round 1: "parsed": null).
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warm the calibration loop's own JIT so pass-1 probes measure the
    // host, not HotSpot compilation.
    calibrate(); calibrate()

    // Each pass sweeps the WHOLE query list round-robin rather than
    // repeating a query back-to-back, so a single contention burst lands
    // on at most one sample per query. Pass 1 additionally pays one-time
    // JIT + whole-stage-codegen compilation (measured 2-4× steady state
    // in round 2), which the min also absorbs. The sweep is ROTATED by
    // one position per pass: PERIODIC external load (a cron job, another
    // tenant's duty cycle) whose period is near the pass length would
    // otherwise align its burn window with the SAME queries every pass,
    // and their min never sees a quiet slot — measured under a 30s-on/
    // 30s-off 32-core burner, two fixed-order queries stayed 1.8-1.9×
    // inflated across all passes while the rotated order bounds every
    // query's worst-case alignment at ceil(passes × duty) passes.
    val loadavgs = scala.collection.mutable.ArrayBuffer[Double]()
    val samples = scala.collection.mutable.Map[String, Vector[Sample]]()
      .withDefaultValue(Vector.empty)
    var quietPasses = 0
    var pass = 0
    while (pass < minPasses || (pass < maxPasses && quietPasses == 0)) {
      pass += 1
      loadavgs += loadAvg()
      var p = probe()
      var passQuiet = p.calib <= quietCalib
      val rot = (pass - 1) % benchList.size
      val order = benchList.drop(rot) ++ benchList.take(rot)
      order.foreach { n =>
        val sec = runOnce(n)
        val pAfter = probe()
        val s = Sample(sec, p, pAfter)
        if (sec >= 0) samples(n) = samples(n) :+ s
        if (sys.env.contains("SPARK_GRAFT_BENCH_DEBUG"))
          System.err.println(f"[bench-sample] $n $sec%.4f cb=${p.calib}%.4f ca=${pAfter.calib}%.4f st=${s.stealFrac}%.4f")
        passQuiet &&= pAfter.calib <= quietCalib && s.stealFrac <= stealTol
        p = pAfter
      }
      if (passQuiet) quietPasses += 1
    }
    loadavgs += loadAvg()

    val allSamples = benchList.flatMap(samples(_))
    val allCalibs = allSamples.flatMap(s => Seq(s.before.calib, s.after.calib))

    def fmt(d: Double): String = "%.6f".format(d)
    val results = benchList.map { n =>
      val xs = samples(n).map(_.sec)
      n -> (if (xs.isEmpty) -1.0 else xs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // Per-query spread so a reader can judge how trustworthy each min is:
    // [min, max, median, nSamples]. Separate key so the driver's
    // queries-parse is untouched.
    val spread = benchList.map { k =>
      val xs = samples(k).map(_.sec)
      val body =
        if (xs.isEmpty) "[-1,-1,-1,0]"
        else s"[${fmt(xs.min)},${fmt(xs.max)},${fmt(median(xs))},${xs.size}]"
      "\"" + k + "\":" + body
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val quietProbeFrac =
      if (allCalibs.isEmpty) 0.0
      else allCalibs.count(_ <= quietCalib).toDouble / allCalibs.size
    val calibJson =
      if (allCalibs.isEmpty) """{"best":-1,"median":-1,"worst":-1,"quiet_frac":0}"""
      else s"""{"best":${fmt(allCalibs.min)},"median":${fmt(median(allCalibs))},"worst":${fmt(allCalibs.max)},"quiet_frac":${fmt(quietProbeFrac)},"quiet_calib":$quietCalib}"""
    val stealMax =
      if (allSamples.isEmpty) 0.0 else allSamples.map(_.stealFrac).max
    val loadJson = loadavgs.map(fmt).mkString("[", ",", "]")
    val allFsyncs = allSamples.flatMap(s =>
      Seq(s.before.fsync, s.after.fsync))
    val fsyncJson =
      if (allFsyncs.isEmpty) """{"best":-1,"median":-1,"worst":-1}"""
      else s"""{"best":${fmt(allFsyncs.min)},"median":${fmt(median(allFsyncs))},"worst":${fmt(allFsyncs.max)}}"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","est":"min_of_passes","queries":$qs,"spread":$spread,"calib":$calibJson,"fsync_calib":$fsyncJson,"quiet_passes":$quietPasses,"steal_max_frac":${fmt(stealMax)},"loadavg":$loadJson,"passes":$pass,"sf":"$sfDir"}""")
    spark.stop()
  }
}

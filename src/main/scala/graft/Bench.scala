package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Each query gets one untimed warmup execution
  * (JIT + codegen compilation + parquet footer caching) and one timed
  * run — the steady-state number is what a long-lived cluster session
  * would see, and it is stable across invocations instead of being
  * dominated by first-query JVM warmup noise.
  *
  * The emitted JSON is self-adjudicating: next to each wall time it
  * carries the timed run's PROCESS CPU time (`cpu` map) and two 1-second
  * effective-cores probes (`probe`, at bench start and end). A wall-time
  * blowup whose CPU time matches the recorded baseline was starved by a
  * co-tenant, not by a plan regression — distinguishable from the
  * artifact alone, without a manual re-measure.
  */
object Bench {
  // Process CPU time (all JVM threads — in local mode that includes the
  // executors). com.sun.management is the JDK's own extension interface,
  // present on every HotSpot JVM.
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def procCpuSec(): Double = osBean.getProcessCpuTime / 1e9

  /** 1-second effective-cores probe: CPU seconds a spin burn actually
    * obtains per wall second across `n` threads. ~n on an idle box,
    * well below n under a co-tenant burst.
    */
  private def effectiveCores(n: Int = 8, millis: Long = 1000): Double = {
    val cpu0 = procCpuSec()
    val t0 = System.nanoTime()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to n).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!stop.get()) { x += 1; if (x == Long.MaxValue) x = 0 }
      })
      t.setDaemon(true); t.start(); t
    }
    Thread.sleep(millis)
    stop.set(true)
    threads.foreach(_.join(200))
    val wall = (System.nanoTime() - t0) / 1e9
    (procCpuSec() - cpu0) / wall
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default matches the driver's environment (local[32]) so local bench
    // numbers predict driver bench numbers.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // custom strategy + optimizer rules + SQL functions (idempotent)
    GraftExtensions.register(spark)
    val coresStart = effectiveCores()
    // The timed action is a noop-format write: every output row is fully
    // materialized through the executed plan, so projections, sorts and
    // expression work stay IN the measurement (a bare `count()` lets
    // Catalyst prune projection columns and drop orderBys — it times a
    // row-count scan, not the declared query).
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // Timing layout: two suite-wide passes (plus up to two top-up
    // passes restricted to queries whose best two samples still
    // disagree by >30%), each sample = one UNTIMED warmup execution
    // immediately followed by the timed run — report each query's min.
    //
    // Why both halves matter on a shared sandbox:
    //   - Samples of one query are pass-separated (minutes apart), so a
    //     co-tenant CPU burst — they last minutes here — can no longer
    //     cover every sample of a query the way it covered back-to-back
    //     repeats (measured: a 3.3 s sketch_quantile whose isolated
    //     steady state was 1.6 s, all consecutive samples inside one
    //     burst).
    //   - The warmup must be ADJACENT to its timed run, not a separate
    //     warmup pass: ~100 queries' generated classes overflow Spark's
    //     bounded codegen cache, so by the time a pass returns to a
    //     query its code is evicted and a bare re-run pays whole-stage
    //     re-codegen (measured: a 0.9 s scan query timing at 3.1 s in
    //     every warmup-less pass).
    // Cache state is reset BETWEEN queries so each measurement starts
    // from the same (empty) storage pool instead of whatever earlier
    // queries left behind: accumulated persists can evict a query's own
    // warmup cache mid-bench, which showed up as a 3× swing on the
    // driver that no local run reproduced.
    // Each sample is (wallSec, processCpuSec) for the timed run.
    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      run(fn) // warm-adjacent: codegen + JIT + IO caches
      val c0 = procCpuSec()
      val t0 = System.nanoTime(); run(fn)
      ((System.nanoTime() - t0) / 1e9, procCpuSec() - c0)
    }
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map[String, List[(Double, Double)]]()
    val failed = scala.collection.mutable.Set[String]()
    // Wall-clock budget: the first pass ALWAYS completes (every query
    // gets one warm-adjacent sample — a partial run that times out
    // upstream would report nothing at all), later passes only start a
    // query while inside the budget. Under contention the bench
    // degrades to fewer samples per query, never to no output.
    // Reserve headroom inside the budget: the budget is enforced by an
    // EXTERNAL process kill, and r03 finished at 1222 s against 1200 —
    // killed mid-println, which truncated the one JSON line the driver
    // parses. The in-process deadline must cover JVM/sbt startup before
    // main() (not visible here), the last started query running to
    // completion, and JSON emission — so stop starting work 180 s early.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1200").toLong
    val deadline =
      System.nanoTime() + math.max(budgetSec - 180L, budgetSec / 2) * 1000000000L
    def pass(only: String => Boolean, bounded: Boolean): Unit =
      qseq.foreach { case (name, fn) =>
        if (only(name) && !failed(name) &&
            !(bounded && System.nanoTime() > deadline)) {
          try samples(name) = timed(fn) :: samples.getOrElse(name, Nil)
          catch { case _: Throwable => failed += name }
          finally spark.catalog.clearCache()
        }
      }
    def unsettled(name: String): Boolean = samples.get(name) match {
      case Some(ts) if ts.length >= 2 =>
        val s = ts.map(_._1).sorted; s(1) > s.head * 1.3
      case _ => !failed(name)
    }
    pass(_ => true, bounded = false)
    pass(_ => true, bounded = true)
    pass(unsettled, bounded = true)
    pass(unsettled, bounded = true)
    val coresEnd = effectiveCores()
    // Per query: the min-wall sample's wall AND that same sample's CPU
    // time (pairing them keeps the ratio meaningful — min wall with max
    // CPU from different samples would overstate parallelism).
    val results = qseq.map { case (name, _) =>
      name -> (if (failed(name) || !samples.contains(name)) (-1.0, -1.0)
               else samples(name).minBy(_._1))
    }
    // Truncation-robust emission. The driver records only the LAST
    // ~2000 chars of output, and the full 245-query map is ~6 KB — a
    // single trailing line gets its head (including `{"metric":…`) cut
    // off, leaving an unparseable fragment (r04: 72/245 figures
    // visible, parsed: null). So: (1) the FULL map goes out first and
    // is also persisted to BENCH_FULL.json next to the build, for any
    // consumer that reads whole stdout or the repo; (2) the FINAL line
    // — the one a tail capture is guaranteed to contain intact — is a
    // compact self-contained JSON that fits the window: total, query
    // count, a pointer to the full map, and the failed + slowest
    // per-query figures that fit under the cap.
    def fmt(v: Double): String =
      if (v < 0) "-1.0" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._1) }
      .mkString("{", ",", "}")
    val cpuQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._2) }
      .mkString("{", ",", "}")
    val probe = s"""{"cores_start":${fmt(coresStart)},"cores_end":${fmt(coresEnd)}}"""
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"cpu":$cpuQs,"probe":$probe,"sf":"$sfDir"}"""
    println(full)
    val fullPath = java.nio.file.Paths.get("BENCH_FULL.json").toAbsolutePath
    try java.nio.file.Files.write(fullPath, (full + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () } // never let persistence kill the line
    // Compact tail line: failures first (a -1.0 must never be hidden
    // by truncation), then slowest-first — the figures that matter for
    // a perf read. Greedy-pack under 1700 chars, leaving headroom for
    // sbt's own trailing lines inside the 2000-char window.
    val prioritized =
      results.filter(_._2._1 < 0) ++ results.filter(_._2._1 >= 0).sortBy(-_._2._1)
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${results.count(_._2._1 < 0)},"probe":$probe,"queries_full":"$fullPath","queries":{"""
    val sb = new StringBuilder(head)
    var first = true
    prioritized.foreach { case (k, v) =>
      val entry = (if (first) "" else ",") + "\"" + k + "\":" + fmt(v._1)
      if (sb.length + entry.length <= 1700) { sb.append(entry); first = false }
    }
    sb.append("}}")
    println(sb.toString)
    System.out.flush()
    spark.stop()
  }
}

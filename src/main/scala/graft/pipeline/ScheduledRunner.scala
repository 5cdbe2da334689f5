package graft.pipeline

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import graft.sources.Connector

/** T1: the reference's cron scheduling (`/root/reference/provider.go:69-87`,
  * default `@midnight`) — each tick is an independent full pipeline run
  * with fresh state, and runs are not re-entrancy-guarded (we improve on
  * that: a tick is skipped if the previous run is still in flight, which
  * the reference would happily overlap).
  *
  * In production the scheduler belongs OUTSIDE the engine (Airflow /
  * K8s CronJob / `Trigger.AvailableNow` streaming); this runner exists
  * for API parity and for long-lived driver processes that want the
  * reference's single-binary shape.
  */
final class ScheduledRunner(
    source: Connector, sink: Connector, cfg: Transfer.Config,
    intervalSeconds: Long,
    onRun: RunStats => Unit = _ => ()) {

  private val exec = Executors.newSingleThreadScheduledExecutor { r =>
    val t = new Thread(r, "graft-scheduler"); t.setDaemon(true); t
  }
  private val running = new AtomicBoolean(false)
  @volatile private var lastStats: Option[RunStats] = None

  def last: Option[RunStats] = lastStats

  /** Run one tick immediately (the reference's per-cron-tick `p.start`). */
  def tick(): RunStats = {
    val stats = Transfer.run(source, sink, cfg)
    lastStats = Some(stats)
    onRun(stats)
    stats
  }

  /** Start the periodic schedule. Fixed DELAY, not fixed rate: a run that
    * overshoots the interval pushes the next run out rather than queueing
    * catch-up executions that would fire back-to-back (fixed-rate on a
    * single-threaded executor never overlaps, it bursts — and a burst of
    * non-incremental appends double-writes). The CAS guard stays as a
    * second line of defense if `tick()` is also called manually.
    */
  def start(): Unit =
    exec.scheduleWithFixedDelay(() => {
      if (running.compareAndSet(false, true)) {
        try tick()
        catch { case e: Throwable =>
          System.err.println(s"[graft-scheduler] run failed: ${e.getMessage}")
        } finally running.set(false)
      }
    }, intervalSeconds, intervalSeconds, TimeUnit.SECONDS)

  def stop(): Unit = exec.shutdownNow()
}

package graft.flow

import java.time.{Duration => JDuration, Instant, LocalTime, ZoneOffset}

/** Daily cron schedule (L3) — the reference's Task 5.2 specifies a
  * Prefect `CronSchedule` firing the nightly flow at 02:00 UTC
  * (Lab_Assignment.pdf p.4; the reference never implemented it — no
  * prefect-flows/ directory exists). This is the minimal schedulable
  * loop: parse "HH:mm" UTC, sleep until the next occurrence, invoke the
  * job, repeat. Per-run failures are caught and logged so one failed
  * night never kills the schedule — transient-error handling lives
  * INSIDE the job ([[NightlyEtl.retry]], 3× with delay).
  *
  * Clock and sleep are injected so the spec can fire the flow with a
  * fake clock; production callers use the defaults.
  */
object Schedule {

  /** Parse "HH:mm" (24-hour, UTC). */
  def parseUtc(spec: String): LocalTime = LocalTime.parse(spec)

  /** Next occurrence of `t` (UTC) strictly after `now`. */
  def nextFire(now: Instant, t: LocalTime): Instant = {
    val today = now.atZone(ZoneOffset.UTC).toLocalDate
      .atTime(t).toInstant(ZoneOffset.UTC)
    if (today.isAfter(now)) today else today.plus(JDuration.ofDays(1))
  }

  /** Run `job` daily at `timeUtc` ("02:00"), `maxRuns` times
    * (Int.MaxValue = run forever). Returns the number of completed
    * (fired) runs. The job receives its scheduled fire instant. */
  def runDaily(timeUtc: String, maxRuns: Int = Int.MaxValue,
      clock: () => Instant = () => Instant.now(),
      sleep: Long => Unit = Thread.sleep)(job: Instant => Unit): Int = {
    val t = parseUtc(timeUtc)
    var runs = 0
    while (runs < maxRuns) {
      val fire = nextFire(clock(), t)
      val waitMs = JDuration.between(clock(), fire).toMillis
      if (waitMs > 0) sleep(waitMs)
      try job(fire)
      catch {
        case e: Throwable =>
          System.err.println(s"[schedule] run at $fire failed: ${e.getMessage}")
      }
      runs += 1
    }
    runs
  }
}

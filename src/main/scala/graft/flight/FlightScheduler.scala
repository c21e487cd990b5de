package graft.flight

import java.time.{Duration, ZonedDateTime}

/** Interval scheduler for [[FlightPipeline]] — the engine-side
  * equivalent of the reference's Prefect deployment
  * (`/root/reference/src/main.py:155-156`, `serve(interval=3600)`):
  * run the pipeline once per fixed interval, forever (or for a
  * bounded number of runs when testing / backfilling).
  *
  * Semantics (fixed-rate, like Prefect's interval schedule):
  *   - tick n is due at `start + n * interval`;
  *   - each run is stamped with its DUE time, not its wall-clock start,
  *     so snapshot paths stay on the hourly grid even when a run
  *     starts late;
  *   - a run that overruns its interval does NOT stack: the scheduler
  *     skips straight to the next due tick still in the future
  *     (missed ticks are dropped, matching Prefect's default
  *     late-run collapse rather than an unbounded catch-up burst);
  *   - a failing run is logged and the loop continues — one bad API
  *     pull must not kill the deployment.
  *
  * Clock and sleeper are injectable so the spec drives a year of
  * schedule in milliseconds; production uses the real ones.
  */
final class FlightScheduler(
    pipeline: FlightPipeline,
    interval: Duration = Duration.ofHours(1),
    clock: () => ZonedDateTime = () => ZonedDateTime.now(FlightIo.ParisZone),
    sleep: Duration => Unit = d => Thread.sleep(d.toMillis),
    onError: (ZonedDateTime, Throwable) => Unit = (t, e) =>
      System.err.println(s"[flight-scheduler] run due $t failed: $e")) {

  require(!interval.isZero && !interval.isNegative, "interval must be positive")

  /** Run the schedule for `maxRuns` ticks (Int.MaxValue = serve
    * forever). Returns the gold snapshot path of each SUCCESSFUL run
    * for bounded schedules; a serve-forever run returns Nil rather
    * than accumulating an unbounded path list in memory (callers that
    * need per-run paths in that mode observe them via `onRun`).
    * `onRun` fires after each SUCCESSFUL run, outside the failure
    * isolation: an exception it throws is the caller's own bug and
    * propagates out of `serve` rather than masquerading as a
    * pipeline failure through `onError`.
    */
  def serve(maxRuns: Int, onRun: String => Unit = _ => ()): Seq[String] = {
    val start = clock()
    val unbounded = maxRuns == Int.MaxValue
    val out = Seq.newBuilder[String]
    var tick = 0L
    var runs = 0
    while (runs < maxRuns) {
      val due = start.plus(interval.multipliedBy(tick))
      val now = clock()
      val wait = Duration.between(now, due)
      if (!wait.isNegative && !wait.isZero) sleep(wait)
      // onRun stays OUTSIDE the pipeline try: a throwing caller
      // callback must not be routed to onError as a pipeline failure
      // (the run already succeeded and was recorded) — it is the
      // caller's own bug and propagates to them
      val ran =
        try {
          val path = pipeline.run(due)
          if (!unbounded) out += path
          Some(path)
        } catch { case scala.util.control.NonFatal(e) => onError(due, e); None }
      ran.foreach(onRun)
      runs += 1
      // next tick strictly after the CURRENT wall clock: overruns skip
      // missed ticks instead of firing a catch-up burst
      val after = clock()
      tick += 1
      while (!start.plus(interval.multipliedBy(tick)).isAfter(after)) tick += 1
    }
    out.result()
  }
}

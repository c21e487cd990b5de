package graft.flight

import graft.TestSpark
import graft.flight.FlightModel._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.time.{Duration, ZoneOffset, ZonedDateTime}

/** Interval scheduling (reference `main.py:155-156` Prefect
  * `serve(interval=3600)`): due-time stamping, overrun collapse,
  * failure isolation — driven by a fake clock, zero real sleeping.
  */
class FlightSchedulerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkSource(onFetch: Int => Unit): FlightSource = new FlightSource {
    private var calls = 0
    def zones: Seq[Zone] = Seq(Zone(90, -180, -90, 180))
    def flightsInZone(zone: Zone, limit: Int): Seq[Flight] = {
      calls += 1; onFetch(calls)
      Seq(Flight("f1", "A359", Some(1713453442), Some(1f), Some(2f),
        "SIN", "JFK", "SQ24", Some(0), "SIA"))
    }
    def airlines: Seq[Airline] = Seq(Airline("Singapore Airlines", "SIA"))
    def airports: Seq[Airport] = Seq(
      Airport("Singapore Changi Airport", "SIN", Some(1.350189f), Some(103.9944f), "Singapore"),
      Airport("John F. Kennedy International Airport", "JFK", Some(40.639751f), Some(-73.7789f), "United States"))
  }

  test("serve stamps runs on the interval grid and collapses overrun ticks") {
    val tmp = Files.createTempDirectory("graft-sched").toString
    val start = ZonedDateTime.of(2024, 4, 18, 10, 0, 0, 0, ZoneOffset.UTC)
    var now = start
    // first run overruns its hour by 30 min (clock moves inside the
    // fetch); due tick 1 (11:00) is already past when it ends → skipped
    val src = mkSource(call => if (call == 1) now = now.plus(Duration.ofMinutes(90)))
    val sched = new FlightScheduler(
      new FlightPipeline(spark, src, tmp),
      interval = Duration.ofHours(1),
      clock = () => now,
      sleep = d => { assert(!d.isNegative); now = now.plus(d) })
    val paths = sched.serve(maxRuns = 3)
    // Paris wall time of 10:00/12:00/13:00 UTC on 2024-04-18 (CEST = UTC+2)
    assert(paths.map(_.substring(tmp.length)) == Seq(
      "/gold/year=2024/month=04/day=18/flights20240418120000",
      "/gold/year=2024/month=04/day=18/flights20240418140000",
      "/gold/year=2024/month=04/day=18/flights20240418150000"))
  }

  test("a failing run is reported and the schedule continues") {
    val tmp = Files.createTempDirectory("graft-sched-err").toString
    val start = ZonedDateTime.of(2024, 4, 18, 10, 0, 0, 0, ZoneOffset.UTC)
    var now = start
    val src = mkSource(call => if (call == 2) sys.error("API down"))
    var failures = List.empty[ZonedDateTime]
    val sched = new FlightScheduler(
      new FlightPipeline(spark, src, tmp),
      interval = Duration.ofHours(1),
      clock = () => now,
      sleep = d => { assert(!d.isNegative); now = now.plus(d) },
      onError = (due, _) => failures ::= due)
    val paths = sched.serve(maxRuns = 3)
    assert(paths.size == 2)
    assert(failures == List(start.plus(Duration.ofHours(1))))
  }

  test("a throwing onRun callback propagates to the caller, not onError") {
    val tmp = Files.createTempDirectory("graft-sched-cb").toString
    val start = ZonedDateTime.of(2024, 4, 18, 10, 0, 0, 0, ZoneOffset.UTC)
    var now = start
    var errors = 0
    val sched = new FlightScheduler(
      new FlightPipeline(spark, mkSource(_ => ()), tmp),
      interval = Duration.ofHours(1),
      clock = () => now,
      sleep = d => { assert(!d.isNegative); now = now.plus(d) },
      onError = (_, _) => errors += 1)
    val boom = intercept[RuntimeException] {
      sched.serve(maxRuns = 2, onRun = _ => sys.error("caller bug"))
    }
    assert(boom.getMessage == "caller bug")
    assert(errors == 0) // the pipeline run itself succeeded — not a pipeline failure
  }
}

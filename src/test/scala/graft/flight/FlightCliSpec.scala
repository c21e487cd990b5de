package graft.flight

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** CLI dispatcher over the golden fixture: every reference question
  * name resolves, renders non-empty output, and Q1 matches the golden
  * answer end-to-end through the dispatch path (dash and underscore
  * forms both accepted).
  */
class FlightCliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val fixture = TestSpark.fixturePath("flight_gold_fixture.parquet")

  test("all six questions dispatch and render") {
    FlightCli.questions.keys.foreach { q =>
      val out = FlightCli.run(spark, fixture, q)
      assert(out.nonEmpty, q)
    }
  }

  test("Q1 through the CLI path matches the golden answer") {
    assert(FlightCli.run(spark, fixture, "airline-with-most-flights")
      == "United Airlines (81 flights)")
  }

  test("unknown question lists the available ones") {
    val e = intercept[IllegalArgumentException](FlightCli.run(spark, fixture, "nope"))
    assert(e.getMessage.contains("airline_with_most_flights"))
  }
}

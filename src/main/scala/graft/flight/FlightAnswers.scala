package graft.flight

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.math.BigDecimal.RoundingMode

/** The six analytical queries over the gold table
  * (reference `/root/reference/src/answers.py`), in deterministic
  * form: the reference's order-dependent `first`-after-sort and
  * unordered `collect_list` idioms (SURVEY.md §2.11.2/5) are replaced
  * by window rank-1 / rank-sorted-array equivalents with explicit
  * tiebreaks (count desc, then name asc), so results are stable
  * across partitionings and Spark versions. Where the golden fixture
  * has a unique winner the output matches it exactly; among exact
  * ties the reference itself was partition-order-nondeterministic.
  *
  * All six are top-k / small-result shapes: Spark plans the argmax
  * queries as TakeOrderedAndProject (no full sort) and the per-group
  * winners as a single shuffle on the group key — both scale-safe.
  */
object FlightAnswers {

  /** Q1 (`answers.py:10-25`): airline with the most flights. */
  def airlineWithMostFlights(gold: DataFrame): Row =
    gold.groupBy("airline_name").count()
      .orderBy(col("count").desc, col("airline_name"))
      .first()

  /** Q2 (`answers.py:28-50`): most active airline per continent,
    * counting only intra-continent flights.
    */
  def mostActiveAirlinePerContinent(gold: DataFrame): Map[String, String] = {
    val counted = gold
      .filter(col("origin_continent") === col("destination_continent"))
      .groupBy("airline_name", "origin_continent").count()
    val w = Window.partitionBy(col("origin_continent"))
      .orderBy(col("count").desc, col("airline_name"))
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("origin_continent", "airline_name")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Q3 (`answers.py:53-64`): flight with the longest trajectory. */
  def flightWithLongestTrajectory(gold: DataFrame): Row =
    gold.orderBy(col("distance").desc_nulls_last, col("id")).first()

  /** Q4 (`answers.py:67-83`): average intra-continent flight length,
    * rounded to 2 dp half-even (Python driver-side `round`,
    * `answers.py:84`).
    */
  def averageFlightLengthPerContinent(gold: DataFrame): Map[String, Double] =
    gold.filter(col("origin_continent") === col("destination_continent"))
      .groupBy("origin_continent")
      .agg(avg("distance").as("average_distance"))
      .collect()
      .map(r => r.getString(0) ->
        BigDecimal(r.getDouble(1)).setScale(2, RoundingMode.HALF_EVEN).toDouble)
      .toMap

  /** Q5 (`answers.py:86-105`): top-3 aircraft models per origin
    * country, comma-joined in descending-count order (rank-sorted
    * array, not encounter-order `collect_list`).
    */
  def topThreeAircraftPerCountry(gold: DataFrame): Map[String, String] = {
    val counted = gold.groupBy("aircraft_code", "origin_country").count()
    val w = Window.partitionBy(col("origin_country"))
      .orderBy(col("count").desc, col("aircraft_code"))
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .groupBy("origin_country")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rank"), col("aircraft_code")))),
          x => x.getField("aircraft_code")),
        ", ").as("top_three_aircraft_model"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  /** Q6 (`answers.py:110-130`, untested in the reference): airport
    * with the largest |outgoing − incoming| flight count; inner join
    * of the two aggregate sides, so airports with only one direction
    * are excluded (reference semantics).
    */
  def airportWithMostDiffInOutFlight(gold: DataFrame): Row = {
    val out = gold.groupBy("origin_airport_name").count()
      .withColumnRenamed("count", "outgoing_count")
    val in = gold.groupBy("destination_airport_name").count()
      .withColumnRenamed("count", "incoming_count")
    out.join(in, col("origin_airport_name") === col("destination_airport_name"))
      .withColumn("diff", abs(col("outgoing_count") - col("incoming_count")))
      .orderBy(col("diff").desc, col("origin_airport_name"))
      .first()
  }
}

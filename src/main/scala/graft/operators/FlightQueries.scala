package graft.operators

import graft.QueryDef
import graft.flight.FlightModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-level forms of the six reference queries
  * (`/root/reference/src/answers.py`), exposed through the driver
  * contract as rows-only checks: their value-level correctness is
  * pinned by the golden-fixture suite (`FlightGoldenSpec`), not a SQL
  * oracle — the gold flights table is not part of the TPC-H-ish
  * oracle schema. [[graft.flight.FlightAnswers]] wraps these with the
  * reference's collect-to-driver result shapes.
  */
object FlightQueries {

  /** The reference's own golden gold-layer fixture (copied from
    * `/root/reference/tests/test.parquet`; see FIXTURES.md §1).
    */
  val FixturePath = "/root/repo/src/test/resources/flight_gold_fixture.parquet"

  private def gold(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(FixturePath)

  def airlineFlightCounts(gold: DataFrame): DataFrame =
    gold.groupBy("airline_name").count()
      .orderBy(col("count").desc, col("airline_name"))

  def mostActivePerContinent(gold: DataFrame): DataFrame = {
    val counted = gold
      .filter(col("origin_continent") === col("destination_continent"))
      .groupBy("airline_name", "origin_continent").count()
    val w = Window.partitionBy(col("origin_continent"))
      .orderBy(col("count").desc, col("airline_name"))
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("origin_continent"), col("airline_name").as("most_active_airline"), col("count"))
      .orderBy(col("origin_continent"))
  }

  def longestTrajectories(gold: DataFrame, k: Int = 1): DataFrame =
    gold.orderBy(col("distance").desc_nulls_last, col("id")).limit(k)

  /** 2-dp half-even rounding via `bround` (matches the reference's
    * driver-side Python `round`, `answers.py:84`).
    */
  def avgFlightLengthPerContinent(gold: DataFrame): DataFrame =
    gold.filter(col("origin_continent") === col("destination_continent"))
      .groupBy("origin_continent")
      .agg(bround(avg(col("distance")), 2).as("average_distance"))
      .orderBy(col("origin_continent"))

  def topThreeAircraftPerCountry(gold: DataFrame): DataFrame = {
    val counted = gold.groupBy("aircraft_code", "origin_country").count()
    val w = Window.partitionBy(col("origin_country"))
      .orderBy(col("count").desc, col("aircraft_code"))
    counted.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .groupBy("origin_country")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rank"), col("aircraft_code")))),
          x => x.getField("aircraft_code")),
        ", ").as("top_three_aircraft_model"))
      .orderBy(col("origin_country"))
  }

  def inOutImbalance(gold: DataFrame): DataFrame = {
    val out = gold.groupBy("origin_airport_name").count()
      .withColumnRenamed("count", "outgoing_count")
    val in = gold.groupBy("destination_airport_name").count()
      .withColumnRenamed("count", "incoming_count")
    out.join(in, col("origin_airport_name") === col("destination_airport_name"))
      .withColumn("diff", abs(col("outgoing_count") - col("incoming_count")))
      .select("origin_airport_name", "outgoing_count", "incoming_count", "diff")
      .orderBy(col("diff").desc, col("origin_airport_name"))
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef.rowsOnly("flight_q1_airline_counts")((s, d) => airlineFlightCounts(gold(s, d))),
    QueryDef.rowsOnly("flight_q2_active_per_continent")((s, d) => mostActivePerContinent(gold(s, d))),
    QueryDef.rowsOnly("flight_q3_longest_trajectory")((s, d) => longestTrajectories(gold(s, d))),
    QueryDef.rowsOnly("flight_q4_avg_length_per_continent")((s, d) => avgFlightLengthPerContinent(gold(s, d))),
    QueryDef.rowsOnly("flight_q5_top3_aircraft")((s, d) => topThreeAircraftPerCountry(gold(s, d))),
    QueryDef.rowsOnly("flight_q6_inout_imbalance")((s, d) => inOutImbalance(gold(s, d))))

  // FlightModel referenced to bind the module dependency explicitly
  private val _ = FlightModel.goldColumns
}

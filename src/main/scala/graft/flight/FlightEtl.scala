package graft.flight

import graft.functions.Geo
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Silver/gold transforms (reference `/root/reference/src/transform.py`),
  * UDF-free: the continent lookup is a literal-map expression and the
  * haversine is a native column expression, so the whole gold stage
  * stays inside whole-stage codegen — the headline perf win over the
  * reference's `BatchEvalPython` islands.
  *
  * Join shape: the three enrichment joins (`transform.py:211,223,242`)
  * broadcast the dims explicitly. Airports/airlines are bounded-size
  * dimensions (10³–10⁴ rows) at any fact scale, so at 100 TB of
  * flights these stay map-side joins with no shuffle of the fact
  * table; inner semantics intentionally drop unmatched rows
  * (SURVEY.md §2.11.7).
  */
object FlightEtl {

  /** Silver stage (`transform.py:156-194`): dedup by flight id (keeps
    * one arbitrary row, §2.11.8) and render int unix seconds as a
    * `yyyy-MM-dd HH:mm:ss` string in Europe/Paris wall time
    * (`transform.py:189-192`). Implemented TZ-explicitly via
    * `from_utc_timestamp` rather than mutating the session timezone;
    * assumes the session renders timestamps in UTC (pinned by
    * build.sbt for this engine).
    */
  def silver(raw: DataFrame): DataFrame =
    raw.dropDuplicates("id")
      .withColumn("time",
        date_format(
          from_utc_timestamp(timestamp_seconds(col("time")), "Europe/Paris"),
          "yyyy-MM-dd HH:mm:ss"))

  /** Adds the derived continent column to the airports dim
    * (`transform.py:151`).
    */
  def airportsWithContinent(airports: DataFrame): DataFrame =
    airports.withColumn("continent", Continents.continentFor(col("country")))

  /** Gold stage (`transform.py:197-264`): silver flights ⋈ airports
    * (role-playing origin + destination) ⋈ airlines, plus float32
    * haversine distance. Lat/lon are cast FloatType first (dims
    * re-read from CSV arrive as strings, `main.py:53`) and widened to
    * double inside the distance computation — the double-then-final-
    * float32-cast order is what makes all 1000 fixture distances
    * bit-exact.
    */
  def gold(flights: DataFrame, airports: DataFrame, airlines: DataFrame): DataFrame = {
    val ap = airportsWithContinent(airports)

    def rolePlay(prefix: String): DataFrame = ap.select(
      col("name").as(s"${prefix}_airport_name"),
      col("iata").as(s"__${prefix}_iata"),
      col("latitude").cast(FloatType).as(s"${prefix}_latitude"),
      col("longitude").cast(FloatType).as(s"${prefix}_longitude"),
      col("continent").as(s"${prefix}_continent"),
      col("country").as(s"${prefix}_country"))

    val al = airlines.select(col("Name").as("airline_name"), col("ICAO").as("__icao"))

    flights
      .join(broadcast(rolePlay("origin")),
        col("origin_airport_iata") === col("__origin_iata"), "inner")
      .join(broadcast(rolePlay("destination")),
        col("destination_airport_iata") === col("__destination_iata"), "inner")
      .join(broadcast(al), col("airline_icao") === col("__icao"), "inner")
      .withColumn("distance",
        Geo.haversineKm(
          col("origin_latitude").cast(DoubleType),
          col("origin_longitude").cast(DoubleType),
          col("destination_latitude").cast(DoubleType),
          col("destination_longitude").cast(DoubleType)).cast(FloatType))
      .select(FlightModel.goldColumns.map(col): _*)
  }
}

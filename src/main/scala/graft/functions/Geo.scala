package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions as pure Catalyst column expressions —
  * no UDF, so they stay inside whole-stage codegen and null-propagate
  * natively.
  *
  * Re-expresses the reference's Python haversine UDF
  * (`/root/reference/src/transform.py:57-87`) as a column expression:
  * great-circle distance, km, R=6371, computed in double precision;
  * callers cast the final value to FloatType where float32 semantics
  * are required (the reference's UDF declared a float32 return type).
  */
object Geo {

  /** Haversine great-circle distance in kilometres between
    * (lat1, lon1) and (lat2, lon2), all in decimal degrees.
    *
    * d = 2·R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))), R = 6371 km.
    * Null in any input → null out (native expression null-propagation,
    * matching `transform.py:69-70`).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val a = pow(sin(radians(lat2 - lat1) / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) *
        pow(sin(radians(lon2 - lon1) / 2), 2)
    lit(2 * 6371.0) * asin(sqrt(a))
  }
}

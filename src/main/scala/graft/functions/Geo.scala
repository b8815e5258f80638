package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geodesic column functions.
  *
  * Haversine distance is the predicate of the reference's flagship analytic
  * ("deaths within 10 km of a power plant" — /root/reference/docs/Report.md:85-89,
  * presentation production slide). Implemented as a pure composition of built-in
  * expressions so it stays inside whole-stage codegen — no UDF, no serialization.
  */
object Geo {
  val EarthRadiusKm: Double = 6371.0

  /** Great-circle distance between two (lat, lon) points in degrees, on a
    * sphere of the given radius (output unit = radius unit).
    */
  def haversine(lat1: Column, lon1: Column, lat2: Column, lon2: Column, sphereRadius: Double): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    // clamp: near-antipodal points can round a to 1 + ulp, and
    // asin(sqrt(a > 1)) = NaN — which silently FAILS every <= radius
    // predicate instead of returning ~half the circumference. least() is a
    // no-op bit-for-bit whenever a <= 1, so oracle parity is unchanged
    // (the SQL mirror clamps identically).
    lit(2 * sphereRadius) * asin(sqrt(least(a, lit(1.0))))
  }

  /** Great-circle distance in km between two (lat, lon) points in degrees. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    haversine(lat1, lon1, lat2, lon2, EarthRadiusKm)

  /** The same formula as ANSI SQL text (DuckDB-compatible), for oracle queries.
    * Keep the expression tree structurally identical to [[haversineKm]] so both
    * engines evaluate the same float operations in the same order.
    */
  def haversineKmSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"2 * 6371.0 * asin(sqrt(least(" +
      s"pow(sin(radians($lat2 - $lat1) / 2), 2) + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * pow(sin(radians($lon2 - $lon1) / 2), 2), 1.0)))"
}

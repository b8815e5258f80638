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

  /** Point-in-convex-polygon (boundary-inclusive) over INTEGER
    * coordinates: the point is inside iff every directed-edge cross
    * product `(x2−x1)(py−y1) − (y2−y1)(px−x1)` is ≥ 0 with the vertices
    * in counter-clockwise order — pure integer shift-free arithmetic, so
    * the predicate is EXACT (no epsilon, no orientation flakiness) and
    * mirrors into SQL verbatim. The geofence primitive one step up from
    * the radius join: territory assignment, region tagging, polygon
    * filters over a quantized lat/lon grid.
    *
    * Vertices must be CCW and convex; both are the caller's contract
    * (assert offline — a convexity check per row would be waste).
    * Codegen-friendly composition of built-ins; O(|vertices|) per row.
    *
    * The INTEGER contract is ENFORCED, not assumed: a fractional
    * coordinate used to truncate through cast("long") — classifying via
    * a point the caller never supplied while the SQL mirror evaluated
    * the fraction in doubles (oracle divergence) — and coordinates past
    * 2^30 could wrap the 64-bit cross products silently under ANSI-off,
    * breaking the "EXACT, no epsilon" guarantee. Both now fail loudly
    * in-plan (vertices at require-time); |coord| ≤ 2^30 keeps every
    * cross product within 2^63. NULL coordinates keep their original
    * semantics (NULL predicate → row filtered).
    */
  def pointInConvexPolygon(px: Column, py: Column, vertices: Seq[(Long, Long)]): Column = {
    require(vertices.length >= 3, "a polygon needs at least 3 vertices")
    val bound = 1L << 30
    require(vertices.forall { case (x, y) => math.abs(x) <= bound && math.abs(y) <= bound },
      s"polygon vertices must satisfy |coord| <= 2^30 so edge cross products stay in 63 bits")
    def checked(c: Column, name: String): Column = {
      val l = c.cast("long")
      when(c.isNull, lit(null).cast("long"))
        // range check, not abs(): abs(Long.MinValue) wraps NEGATIVE, so a
        // coordinate saturating to -2^63 under the ANSI-off cast would slip
        // through an abs-based guard and overflow the cross products silently
        .when(c.cast("double") === l.cast("double") && l >= lit(-bound) && l <= lit(bound), l)
        .otherwise(raise_error(concat(
          lit(s"pointInConvexPolygon: $name = "), c.cast("string"),
          lit(" violates the integer-coordinate contract (must be integral with |v| <= 2^30)"))))
    }
    val pxl = checked(px, "px")
    val pyl = checked(py, "py")
    val edges = vertices.zip(vertices.tail :+ vertices.head)
    edges.map { case ((x1, y1), (x2, y2)) =>
      (lit(x2 - x1) * (pyl - lit(y1)) -
        lit(y2 - y1) * (pxl - lit(x1))) >= 0
    }.reduce(_ && _)
  }

  /** SQL mirror of [[pointInConvexPolygon]] — identical integer algebra. */
  def pointInConvexPolygonSql(px: String, py: String, vertices: Seq[(Long, Long)]): String = {
    val edges = vertices.zip(vertices.tail :+ vertices.head)
    edges.map { case ((x1, y1), (x2, y2)) =>
      s"(${x2 - x1} * ($py - $y1) - ${y2 - y1} * ($px - $x1) >= 0)"
    }.mkString("(", " AND ", ")")
  }
}

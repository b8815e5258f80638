package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.plans.Graft

class RadiusRuleSpec extends SparkSpec {
  import spark.implicits._

  def points(n: Int, seedA: Int, seedB: Int) =
    spark.range(0, n).select($"id",
      (($"id" * seedA % 1200) / 10.0 - 60.0).as("lat"),
      (($"id" * seedB % 3000) / 10.0 - 150.0).as("lon"))

  test("naive crossJoin + haversine filter is rewritten to a banded hash join with identical results") {
    Graft.install(spark)
    val l = points(150, 7, 13).withColumnsRenamed(Map("id" -> "lid", "lat" -> "llat", "lon" -> "llon"))
    val r = points(10, 91, 53).withColumnsRenamed(Map("id" -> "rid", "lat" -> "rlat", "lon" -> "rlon"))

    val naive = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(300.0))
      .select("lid", "rid")

    val physical = naive.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire:\n$physical")
    assert(physical.contains("HashJoin"), s"expected a hash join:\n$physical")
    // 2-D keys: latitude band AND longitude ring cell must both be join keys
    assert(physical.contains("_graft_band") && physical.contains("_graft_ring"),
      s"expected band+ring equi-keys:\n$physical")

    // ground truth from an uninstalled path: force the nested-loop by using
    // a fresh logical plan evaluated without the rule
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val brute = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(300.0))
      .select("lid", "rid")
    val bruteSet = brute.as[(Long, Long)].collect().toSet
    assert(brute.queryExecution.executedPlan.toString.contains("NestedLoop") ||
      brute.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    spark.experimental.extraOptimizations = prev

    assert(naive.as[(Long, Long)].collect().toSet == bruteSet)
    assert(bruteSet.nonEmpty)
  }

  test("2-D rewrite stays exact at poles and across the antimeridian") {
    Graft.install(spark)
    val l = spark.range(0, 300).select($"id".as("lid"),
      (($"id" * 37 % 1799) / 10.0 - 89.9).as("llat"),
      (($"id" * 53 % 3599) / 10.0 - 179.9).as("llon"))
    val r = spark.range(0, 40).select($"id".as("rid"),
      (($"id" * 91 % 1799) / 10.0 - 89.9).as("rlat"),
      (($"id" * 13 % 3599) / 10.0 - 179.9).as("rlon"))
    def q = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(500.0))
      .select("lid", "rid")
    assert(!q.queryExecution.executedPlan.toString.contains("NestedLoopJoin"))
    val got = q.as[(Long, Long)].collect().toSet
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val brute = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(500.0))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    spark.experimental.extraOptimizations = prev
    assert(got == brute && brute.nonEmpty)
  }

  test("regression: a 1-2-cell polar ring must not DUPLICATE pairs (multiset, not set, equality)") {
    Graft.install(spark)
    // all points inside lat 88-89.9: the band's ±1 reach touches the pole,
    // so ringWidthOf returns up to 360° and ring collapses to 1 (or 2) —
    // the ±1 dRing replicas collide modulo ring and, before the replica
    // dedup, every qualifying pair joined 2-3× (the exact filter keeps all
    // copies; the earlier pole test compared toSet, which masked this)
    val l = spark.range(0, 60).select($"id".as("lid"),
      (lit(88.0) + ($"id" * 7 % 19) / 10.0).as("llat"),
      (($"id" * 53 % 3599) / 10.0 - 179.9).as("llon"))
    val r = spark.range(0, 30).select($"id".as("rid"),
      (lit(88.0) + ($"id" * 11 % 19) / 10.0).as("rlat"),
      (($"id" * 13 % 3599) / 10.0 - 179.9).as("rlon"))
    def q = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(500.0))
      .select("lid", "rid")
    assert(!q.queryExecution.executedPlan.toString.contains("NestedLoopJoin"))
    val got = q.as[(Long, Long)].collect().toSeq.sorted
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val brute = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(500.0))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    spark.experimental.extraOptimizations = prev
    assert(brute.nonEmpty && brute.distinct == brute)
    assert(got == brute,
      s"multiset mismatch: got ${got.size} rows (${got.distinct.size} distinct), " +
        s"brute ${brute.size}")
  }

  test("symmetric orientation — haversine(right, left) — rewrites too, identical results") {
    Graft.install(spark)
    val l = points(150, 7, 13).withColumnsRenamed(Map("id" -> "lid", "lat" -> "llat", "lon" -> "llon"))
    val r = points(10, 91, 53).withColumnsRenamed(Map("id" -> "rid", "lat" -> "rlat", "lon" -> "rlon"))
    // the RIGHT side's coordinates as the FIRST point pair: great-circle
    // distance is symmetric, so this must rewrite exactly like the
    // canonical orientation instead of silently staying a Cartesian
    val naive = l.crossJoin(r)
      .where(Geo.haversineKm($"rlat", $"rlon", $"llat", $"llon") <= lit(300.0))
      .select("lid", "rid")
    val physical = naive.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire on the symmetric orientation:\n$physical")
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val brute = l.crossJoin(r)
      .where(Geo.haversineKm($"rlat", $"rlon", $"llat", $"llon") <= lit(300.0))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
    spark.experimental.extraOptimizations = prev
    assert(naive.as[(Long, Long)].collect().toSeq.sorted == brute && brute.nonEmpty)
  }

  test("regression: in-radius pair through the narrow lon-seam sliver is not dropped") {
    // with ceil-based ring sizing the final cell was narrower than the ring
    // width; this exact pair (10.78 km apart at r=11) straddled it and
    // vanished from the rewritten join
    Graft.install(spark)
    val l = Seq((1L, 1.0, 359.954)).toDF("lid", "llat", "llon")
    val r = Seq((2L, 1.0, 0.050)).toDF("rid", "rlat", "rlon")
    val got = l.crossJoin(r)
      .where(Geo.haversineKm($"llat", $"llon", $"rlat", $"rlon") <= lit(11.0))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("rule leaves equi-joins and non-haversine filters untouched") {
    Graft.install(spark)
    val l = points(50, 7, 13).withColumnsRenamed(Map("id" -> "lid"))
    val r = points(50, 91, 53).withColumnsRenamed(Map("id" -> "rid", "lat" -> "rlat", "lon" -> "rlon"))
    val eq = l.join(r, $"lid" === $"rid").where($"lat" > -100)
    assert(eq.count() === 50) // just exercises the path; no rewrite crash
  }

  test("SQL surface: graft_haversine_km / graft_cosine_sim / graft_dot registered by install") {
    Graft.install(spark)
    val km = spark.sql(
      "SELECT graft_haversine_km(48.8566, 2.3522, 45.764, 4.8357) AS km").head().getDouble(0)
    assert(math.abs(km - 392.0) < 5.0) // Paris -> Lyon ~ 392 km
    val sim = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s, " +
      "graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(math.abs(sim.getDouble(0) - 1.0) < 1e-12 && sim.getDouble(1) == 11.0)
    val fps = spark.sql("SELECT size(graft_winnow('abcdefghijklmnop', 8, 4)) AS n").head().getInt(0)
    assert(fps >= 1) // winnow kernel reachable from SQL
  }

  test("rule is unit-agnostic: a miles-based haversine gets a correspondingly wider band") {
    Graft.install(spark)
    val l = points(150, 7, 13).withColumnsRenamed(Map("id" -> "lid", "lat" -> "llat", "lon" -> "llon"))
    val r = points(10, 91, 53).withColumnsRenamed(Map("id" -> "rid", "lat" -> "rlat", "lon" -> "rlon"))
    val EarthMiles = 3958.8
    def q = l.crossJoin(r)
      .where(Geo.haversine($"llat", $"llon", $"rlat", $"rlon", EarthMiles) <= lit(200.0)) // 200 mi ~ 322 km
      .select("lid", "rid")
    assert(!q.queryExecution.executedPlan.toString.contains("NestedLoopJoin"))
    val got = q.as[(Long, Long)].collect().toSet
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    val brute = l.crossJoin(r)
      .where(Geo.haversine($"llat", $"llon", $"rlat", $"rlon", EarthMiles) <= lit(200.0))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    spark.experimental.extraOptimizations = prev
    assert(got == brute && brute.nonEmpty)
  }

  test("pointInConvexPolygon: vertices and edge midpoints are inside (boundary-inclusive), outside points are not") {
    import spark.implicits._
    // unit-ish CCW square (0,0)(10,0)(10,10)(0,10)
    val sq = Seq((0L, 0L), (10L, 0L), (10L, 10L), (0L, 10L))
    val pts = Seq(
      (1L, 5L, 5L, true),    // interior
      (2L, 0L, 0L, true),    // vertex on boundary
      (3L, 5L, 0L, true),    // edge midpoint
      (4L, 10L, 10L, true),  // far vertex
      (5L, 11L, 5L, false),  // just outside east
      (6L, 5L, -1L, false),  // just outside south
      (7L, -1L, -1L, false)) // outside corner diagonal
      .toDF("id", "x", "y", "want")
    val got = pts.select($"id", $"want",
        Geo.pointInConvexPolygon($"x", $"y", sq).as("in"))
      .as[(Long, Boolean, Boolean)].collect()
    got.foreach { case (id, want, in) => assert(in === want, s"point $id") }
    // triangle (odd vertex count) sanity
    val tri = Seq((0L, 0L), (4L, 0L), (0L, 4L))
    val g2 = Seq((1L, 1L, 1L), (2L, 3L, 3L)).toDF("id", "x", "y")
      .select($"id", Geo.pointInConvexPolygon($"x", $"y", tri).as("in"))
      .as[(Long, Boolean)].collect().toMap
    assert(g2(1L) && !g2(2L))
  }
}

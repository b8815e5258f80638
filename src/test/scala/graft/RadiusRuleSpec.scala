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

  test("rule leaves equi-joins and non-haversine filters untouched") {
    Graft.install(spark)
    val l = points(50, 7, 13).withColumnsRenamed(Map("id" -> "lid"))
    val r = points(50, 91, 53).withColumnsRenamed(Map("id" -> "rid", "lat" -> "rlat", "lon" -> "rlon"))
    val eq = l.join(r, $"lid" === $"rid").where($"lat" > -100)
    assert(eq.count() === 50) // just exercises the path; no rewrite crash
  }
}

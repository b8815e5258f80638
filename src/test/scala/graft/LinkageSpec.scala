package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val clean = Seq(
    (1L, "Acme Corp", "b1"),
    (2L, "Acme Core", "b1"),
    (3L, "Zenith Ltd", "b2"),
    (4L, "Acme Corp", "b9") // same name, WRONG block — must never be a candidate
  ).toDF("id", "name", "block")

  test("bestMatch resolves to the minimum edit distance within the block") {
    val dirty = Seq((10L, "Acme Cort", "b1")).toDF("id", "name", "block")
    // dist 1 to both "Acme Corp" and "Acme Core" → tie on dist, min clean id wins
    val got = Linkage.bestMatch(clean, dirty, maxDist = 3)
      .select(col("dirty_id"), col("clean_id"), col("dist"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((10L, 1L, 1)))
  }

  test("blocking is a hard gate: an exact name in another block is invisible") {
    val dirty = Seq((11L, "Acme Corp", "b7")).toDF("id", "name", "block")
    assert(Linkage.bestMatch(clean, dirty, maxDist = 3).isEmpty)
  }

  test("maxDist filters candidates; beyond-threshold records are absent, not matched loosely") {
    val dirty = Seq(
      (12L, "Acme Corpxxxx", "b1"), // dist 4 to the closest — dropped at maxDist 3
      (13L, "Zenith Ltdx", "b2")    // dist 1 — kept
    ).toDF("id", "name", "block")
    val got = Linkage.bestMatch(clean, dirty, maxDist = 3)
      .select(col("dirty_id"), col("clean_id")).as[(Long, Long)].collect().toSeq
    assert(got == Seq((13L, 3L)))
  }

  test("candidate generation never plans a cartesian product") {
    val dirty = Seq((10L, "Acme Cort", "b1")).toDF("id", "name", "block")
    val plan = Linkage.candidates(clean, dirty, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"unexpected cartesian:\n$plan")
  }

  test("one best match per dirty record even with many in-threshold candidates") {
    val dirty = Seq((20L, "Acme Cor", "b1"), (21L, "Acme Core", "b1"))
      .toDF("id", "name", "block")
    val got = Linkage.bestMatch(clean, dirty, maxDist = 3)
    assert(got.count() == 2)
    assert(got.groupBy("dirty_id").count().where(col("count") > 1).isEmpty)
    // 21 matches its exact twin at dist 0
    assert(got.where(col("dirty_id") === 21).select("clean_id", "dist")
      .as[(Long, Int)].head() == ((2L, 0)))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2 (and
  * the north-star extensions); `oracleSql` holds the DuckDB-equivalent SQL
  * for every hash-checkable one. Definitions live in [[Queries]].
  */
object SparkEntry {

  /** Flagship query (Q-PLANT-DEATHS analog, SURVEY.md §3.3): per-"plant"
    * counts of in-radius points via the grid-bucketed haversine join.
    * Driver smoke-checks rows > 0 on sf0.001 — the left-outer form always
    * returns one row per supplier.
    */
  def entry(spark: SparkSession): DataFrame = {
    Prep.ensure(spark)
    queries("q_plant_deaths")(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

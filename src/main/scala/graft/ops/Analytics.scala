package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's production analytics (SURVEY.md §3.3: Q-RADIUS,
  * Q-PLANT-DEATHS, Q-YEARLY, Q-HEATMAP) as generic operators, plus the
  * window/top-k/session surface the reference lacks (§2.7).
  */
object Analytics extends AnalyticsStatsOps with AnalyticsSeqOps
    with AnalyticsGraphOps with AnalyticsModelOps {
  /** Q-HEATMAP — density by grid cell: `groupBy(bin(x), bin(y)).count()`.
    * Uses floor-binning (exact on doubles) rather than round (whose tie
    * behavior differs across engines).
    */
  def heatmap(df: DataFrame, x: Column, y: Column, xBin: Double, yBin: Double): DataFrame =
    df.groupBy(
        floor(x / xBin).cast("long").as("cell_x"),
        floor(y / yBin).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("cnt"))

  /** Q-YEARLY — per-year counts with an "entity active since" predicate
    * (`year(event) >= active_year`), the slider analytic of the reference's
    * production plan.
    */
  def yearlyActive(df: DataFrame, eventDate: Column, activeYear: Column, groupCols: Seq[Column]): DataFrame =
    df.filter(year(eventDate) >= activeYear)
      .groupBy((year(eventDate).as("yr") +: groupCols): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Rank-within-partition top-n (deterministic: callers must pass a total
    * order). Plans as a single window over one shuffle of the input.
    */
  def rankTopN(df: DataFrame, partition: Seq[Column], order: Seq[Column], n: Int, rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= n)
  }
}

/** Helpers shared across the Analytics*Ops split traits. */
trait AnalyticsBase {
  /** Helper-column names that cannot collide with the input schema: prefix
    * underscores until the name is unused (also reserving against the other
    * fresh names minted in the same call). Collision checks are
    * case-INSENSITIVE, matching Spark's default column resolution — an
    * input column "_G" must still force "_g" to be renamed.
    */
  private[ops] def freshNames(df: DataFrame, bases: String*): Seq[String] = {
    val used = scala.collection.mutable.Set[String](df.columns.map(_.toLowerCase).toIndexedSeq: _*)
    bases.map { b =>
      var n = b
      while (used(n.toLowerCase)) n = "_" + n
      used += n.toLowerCase
      n
    }
  }
}

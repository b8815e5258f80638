package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's production analytics (SURVEY.md §3.3: Q-RADIUS,
  * Q-PLANT-DEATHS, Q-YEARLY, Q-HEATMAP) as generic operators, plus the
  * window/top-k/session surface the reference lacks (§2.7).
  */
object Analytics {

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

  /** Gap-based sessionization in batch: a new session starts when the gap to
    * the previous event of the same key exceeds `gap` (in the units of the
    * numeric ts column). Session ids are a running sum of boundary flags —
    * one shuffle on the key.
    */
  def sessionizeNumeric(df: DataFrame, key: Column, tsNum: Column, gap: Long): DataFrame = {
    val wOrd = Window.partitionBy(key).orderBy(tsNum.asc)
    val prev = lag(tsNum, 1).over(wOrd)
    val isNew = when(prev.isNull || tsNum - prev > gap, 1).otherwise(0)
    df.withColumn("_new_session", isNew)
      .withColumn("session_id", sum(col("_new_session")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new_session")
  }

  /** Single-pass numeric data profile in long format: one row per column
    * with (n, n_null, min, max). The whole profile is ONE aggregate job —
    * 4·|cols| accumulators — not a scan per column.
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_n_$c"),
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"_nn_$c"),
        min(col(c)).cast("double").as(s"_mn_$c"),
        max(col(c)).cast("double").as(s"_mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"_n_$c").as("n"), col(s"_nn_$c").as("n_null"),
        col(s"_mn_$c").as("min_v"), col(s"_mx_$c").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Timestamp-typed convenience wrapper (second granularity). */
  def sessionize(df: DataFrame, key: Column, ts: Column, gapSeconds: Long): DataFrame =
    sessionizeNumeric(df, key, unix_timestamp(ts), gapSeconds)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: write-time clustering so multi-dimensional range
  * predicates prune at read time.
  *
  * Parquet row-group skipping works off per-column min/max. A table sorted
  * by one column prunes only on that column; interleaving the bits of two
  * (or more) dimensions into one Z-order (Morton) key and sorting by THAT
  * keeps rows that are close in every dimension close in the file, so a
  * 2-D box predicate skips most row groups on BOTH columns — the standard
  * 100-TB layout for lat/lon, (customer, date), or any pair of range-
  * filtered columns. One sort at write time; zero per-query cost.
  */
object Layout {

  /** Morton/Z-value of two non-negative ints confined to `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Pure shift/mask
    * expression chain — codegen'd, no UDF; mirrors exactly into the SQL
    * oracle. Callers must pre-scale dimensions into [0, 2^bits).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must fit a positive int pair in a long")
    (0 until bits).map { i =>
      (shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The SQL mirror of [[zValue]] (DuckDB `//` is integer division). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x // ${1L << i}) % 2) * ${1L << (2 * i)} + (($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** Affine-scale a bounded double dimension into [0, 2^bits) for
    * [[zValue]]: floor((v - min) / (max - min) * (2^bits - 1)).
    */
  def scaleToGrid(v: Column, min: Double, max: Double, bits: Int = 16): Column = {
    require(max > min)
    // clamp the affine ratio to [0,1]: an out-of-range input would yield
    // a NEGATIVE (or overlarge) grid coordinate, whose sign-extended bits
    // zValue reads as garbage — and on which the engine (shiftright/AND)
    // and the SQL mirror (//, %, dividend-signed) DISAGREE. In-range
    // values are untouched (the ratio is already inside [0,1]).
    val ratio = least(greatest((v - lit(min)) / lit(max - min), lit(0.0)), lit(1.0))
    floor(ratio * lit((1L << bits) - 1).cast("double")).cast("long")
  }

  /** The SQL mirror of [[scaleToGrid]] — paired like [[zValue]]/
    * [[zValueSql]] so the affine formula can never drift between engine
    * and oracle (it was previously hand-inlined at each oracle site).
    */
  def scaleToGridSql(v: String, min: Double, max: Double, bits: Int = 16): String = {
    require(max > min)
    s"CAST(floor(least(greatest(($v - $min) / ${max - min}, 0.0), 1.0) * ${(1L << bits) - 1}.0) AS BIGINT)"
  }

  /** Write `df` parquet clustered by the Z-order of two pre-scaled integer
    * dimensions. `repartitionByRange` on the z-key puts disjoint z-ranges
    * in separate files AND sorts within each — so both file-level and
    * row-group-level min/max stats become selective for 2-D box reads.
    */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    bits: Int = 16, numFiles: Int = 8): Unit = {
    // fresh helper name: a hardcoded "_z" would overwrite-then-drop a
    // user column of that name (silent data loss in the written table)
    val Seq(z) = Analytics.freshNames(df, "_z")
    df.withColumn(z, zValue(x, y, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as a bucketed+sorted external parquet table at `path`:
    * rows hash-distribute into `numBuckets` files by `keys`, sorted by
    * `keys` within each bucket, so a join or aggregation on the bucket
    * keys between two tables bucketed the SAME way requires NO shuffle
    * exchange — the shuffle is paid ONCE at write time and amortized over
    * every subsequent query (Spark's answer to Hive's CLUSTERED BY and to
    * co-located MPP storage). Thin layout-facing alias of
    * [[Sinks.bucketedTable]] (one implementation — the drop-guard,
    * catalog, and bucket-sizing notes live there); shuffle-freedom is
    * asserted in PlanSpec and SourcesSinksSpec.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    numBuckets: Int, keys: Seq[String]): Unit =
    Sinks.bucketedTable(df, name, numBuckets, keys, Some(path))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixes.
  *
  * `rand()`-based Bernoulli sampling is irreproducible across runs, engines,
  * and re-partitionings — useless for an auditable corpus mix. Hash-based
  * sampling keys the keep/drop decision on a row's own identity: the same
  * row is in or out forever, the sample is a pure filter (predicate
  * pushdown applies, no shuffle), and the exact definition runs in any
  * engine with md5.
  */
object Sampling {

  /** Uniform bucket in [0, 100) from the row key — the first 8 md5 hex chars
    * parsed as an integer (engine-portable; `xxhash64` variant below for
    * production).
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"), lit(100L))

  /** Production form: xxhash64 bucket (codegen, no hex strings). */
  def hashBucketFast(key: Column): Column = pmod(xxhash64(key.cast("string")), lit(100L))

  /** Keep ~pct% of rows, deterministically by key. */
  def sampleByHash(df: DataFrame, key: Column, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.where(hashBucket(key) < pct)
  }

  /** Stratified deterministic sampling: per-stratum keep rates (percent),
    * rows in unlisted strata kept at `defaultPct`. One pass, pure filter.
    */
  def stratifiedSampleByHash(df: DataFrame, stratum: Column, key: Column,
                             pctByStratum: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: pctByStratum.values.toSeq).forall(p => p >= 0 && p <= 100))
    val pct = pctByStratum.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === lit(s), lit(p)).otherwise(acc)
    }
    df.where(hashBucket(key) < pct)
  }
}

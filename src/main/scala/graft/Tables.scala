package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All reads are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file source.
  */
object Tables {
  // Deliberately NOT memoized: caching the DataFrame would pin the parquet
  // file listing (stale reads after a rewrite), break Column-based
  // self-joins (identical attribute ids), and leak sessions (a Dataset
  // strongly references its session, defeating weak keys) — for a planning
  // saving that measured within run noise.
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Prep.ensure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  * All reads are plain parquet scans so Catalyst can push filters and
  * prune columns down to the file source.
  */
object Tables {
  // Memoized per (session, path): repeated loads of the same table across
  // the 50+ registry queries reuse one analyzed relation instead of
  // re-listing files and re-reading parquet footers every time. Weak keys so
  // stopped sessions don't pin entries.
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, DataFrame]]())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Prep.ensure(spark)
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) { m = new java.util.HashMap[String, DataFrame](); cache.put(spark, m) }
      m
    }
    perSession.synchronized {
      val key = s"$dir/$name.parquet"
      var df = perSession.get(key)
      if (df == null) { df = spark.read.parquet(key); perSession.put(key, df) }
      df
    }
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

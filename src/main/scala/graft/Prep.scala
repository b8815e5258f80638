package graft

import org.apache.spark.sql.SparkSession

/** Runtime session settings every entry point applies defensively (the
  * driver may hand us a session we didn't build).
  *
  * - ANSI off: `to_date` must return null on unparseable input — the
  *   reference's strptime-fails→None semantics (SURVEY.md §7.4.5,
  *   /root/reference/dags/global_dag.py:111-118).
  * - nanosAsLong: the driver's `events.parquet` carries INT64 nanosecond
  *   timestamps. On Spark builds that honor this legacy conf they read as
  *   LongType nanos; on builds that ignore it they read as TIMESTAMP_NTZ
  *   (micros truncation). Consumers branch on the resolved schema
  *   (Queries.eventsUs) — setting the conf is harmless where ignored.
  * - CORRECTED time parser: the date shape guards
  *   (Transforms.shapeGuard) over-approximate the CORRECTED formatter's
  *   accept set specifically. Under LEGACY, SimpleDateFormat accepts
  *   inputs the ASCII-anchored guards reject (non-ASCII digits like
  *   '٢٠٢٣-01-01', trailing junk like '2023-01-01T'), which would
  *   silently flip those parses to null — so the policy is pinned, not
  *   left to the build default the bit-identical guarantee rests on.
  * - UTC session timezone: oracle parity (DuckDB compares in UTC). Shuffle
  *   partitioning is sized by the entry points themselves (Bench/Verify set
  *   `spark.sql.shuffle.partitions` from SPARK_GRAFT_CPUS at session build).
  */
object Prep {
  def ensure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "CORRECTED")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Sink operators (SURVEY.md §2.5, ops 21-25).
  *
  * The reference renders per-row INSERT statements into a .sql file and
  * replays them against Postgres with `ON CONFLICT DO NOTHING`
  * (/root/reference/dags/global_dag.py:144-148,197-221) — a SQL-injection-
  * prone, single-threaded sink. Here the production store is partitioned
  * parquet with the same idempotence contract done relationally (anti-join
  * on the key before append).
  */
object Sinks {

  /** Op 23 — CSV staging sink (global_dag.py:57,67; the pandas index column
    * quirk is intentionally not replicated).
    */
  def csvSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Op 21 — non-empty gate: the reference's BranchPythonOperator skip
    * (global_dag.py:151-159). `isEmpty` costs a limit(1) job, not a full
    * scan. Returns whether the write happened.
    */
  def writeIfNonEmpty(df: DataFrame, write: DataFrame => Unit): Boolean =
    if (df.isEmpty) false else { write(df); true }

  /** Ops 18+24+25 — idempotent append to a parquet table: dedup within the
    * batch, anti-join against the existing table on the key (the PK +
    * `ON CONFLICT DO NOTHING` semantics), append only the new rows.
    * Re-running with the same batch is a no-op. Creates the table on first
    * write (op 25's CREATE IF NOT EXISTS).
    *
    * `partitionBy` should be a low-cardinality derived column (the deaths
    * table partitions by death year) so a 100-TB table prunes on read.
    */
  def idempotentParquetAppend(
      spark: SparkSession, batch: DataFrame, path: String,
      keys: Seq[String], partitionBy: Seq[String] = Nil): Long = {
    val newRows =
      (if (existsNonEmpty(spark, path))
        Aggregates.idempotentNewRows(batch, spark.read.parquet(path), keys)
      else batch.dropDuplicates(keys))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // persist so the count and the write share one evaluation of the
      // dedup + anti-join (the anti-join rescans the existing table)
      val n = newRows.count()
      if (n > 0) {
        val w = newRows.write.mode(SaveMode.Append)
        (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
      }
      n
    } finally newRows.unpersist()
  }

  /** Op 24 passthrough — the reference's relational store as a REAL JDBC
    * write (global_dag.py:381-397 replays INSERTs against Postgres; here the
    * batch lands in one distributed `df.write.jdbc`).
    */
  def jdbcSink(df: DataFrame, url: String, table: String,
               props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Idempotent JDBC append: the same dedup + anti-join-on-key contract as
    * [[idempotentParquetAppend]] (`ON CONFLICT DO NOTHING` done
    * relationally) for stores without native upsert. The anti-join is
    * materialized (persist + count) BEFORE the append so the write never
    * scans the table it is inserting into. Creates the table on first write.
    */
  def idempotentJdbcAppend(
      spark: SparkSession, batch: DataFrame, url: String, table: String,
      keys: Seq[String], props: java.util.Properties = new java.util.Properties()): Long = {
    // Existence is probed via JDBC metadata, NOT by catching a failed read:
    // a transient failure (connection, auth, lock) misread as "table absent"
    // would skip the anti-join and append duplicates — the exact violation
    // this function exists to prevent. Real failures propagate.
    val newRows = (if (jdbcTableExists(url, table, props))
      Aggregates.idempotentNewRows(batch, spark.read.jdbc(url, table, props), keys)
    else batch.dropDuplicates(keys))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = newRows.count()
      if (n > 0) newRows.write.mode(SaveMode.Append).jdbc(url, table, props)
      n
    } finally newRows.unpersist()
  }

  private def jdbcTableExists(url: String, table: String, props: java.util.Properties): Boolean =
    org.apache.spark.sql.GraftBridge.jdbcTableExists(url, table, props)

  /** Batch-incremental partition processing — the daily-batch form of the
    * streaming file ledger (ops 20/26): transform and append ONLY the
    * source partitions whose partition value is absent from the
    * destination. The probe reads the destination's partition COLUMN only
    * (partition pruning makes it a directory listing, not a scan), and the
    * source filter prunes unprocessed partitions at the scan. Re-running is
    * a no-op. Returns the number of newly processed partition values.
    */
  def processNewPartitions(
      spark: SparkSession, src: DataFrame, destPath: String, partitionBy: String)(
      transform: DataFrame => DataFrame): Long = {
    val done: Option[DataFrame] =
      if (existsNonEmpty(spark, destPath)) Some(spark.read.parquet(destPath)) else None
    val newVals = done match {
      case Some(d) => src.select(partitionBy).distinct()
        .join(d.select(partitionBy).distinct(), Seq(partitionBy), "left_anti")
      case None => src.select(partitionBy).distinct()
    }
    val vals = newVals.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vals.count()
      if (n > 0)
        transform(src.join(broadcast(vals), Seq(partitionBy), "left_semi"))
          .write.mode(SaveMode.Append).partitionBy(partitionBy).parquet(destPath)
      n
    } finally vals.unpersist()
  }

  /** Bucketed table sink: pre-shuffles once at write time so every later
    * equi-join or aggregation on `keys` between co-bucketed tables runs with
    * NO exchange — the decisive layout choice for repeated 100-TB fact-to-
    * fact joins (shuffle once at ingest, never again). Uses the session
    * catalog (`saveAsTable`; bucket metadata doesn't survive a plain
    * `.parquet(path)` write).
    */
  def bucketedTable(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** True only when the table has at least one DATA file: a directory holding
    * nothing but markers (`_SUCCESS`, a `_temporary` left by a failed write)
    * must take the fresh-table branch — `spark.read.parquet` on it throws
    * (unable to infer schema) and the first real append could never proceed.
    */
  private def existsNonEmpty(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val base = p.toUri.getPath
    val it = fs.listFiles(p, /* recursive = */ true)
    while (it.hasNext) {
      val f = it.next().getPath
      // hidden if the file itself or any directory between it and the table
      // root is a marker (_SUCCESS, _temporary, .crc, ...)
      val anyHidden = Iterator.iterate(f)(_.getParent)
        .takeWhile(q => q != null && q.toUri.getPath != base)
        .exists(q => q.getName.startsWith("_") || q.getName.startsWith("."))
      if (!anyHidden) return true
    }
    false
  }
}

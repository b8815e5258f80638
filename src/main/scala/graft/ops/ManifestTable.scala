package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** A minimal versioned-manifest table format: the commit-protocol answer to
  * the documented concurrency limit of plain parquet paths (see
  * [[Sinks.idempotentParquetAppend]] — two concurrent writers against a bare
  * directory have nothing to serialize against). The reference's store is a
  * single-writer Postgres table (create_death_table.sql:1-8,
  * global_dag.py:381-397); this is the multi-writer, snapshot-isolated form
  * a 100-TB lakehouse needs, built from two filesystem primitives only:
  *
  *  - **CAS via exclusive file creation**: committing version N reserves
  *    `_log/vN.lock` with an atomic create-if-absent (`O_CREAT|O_EXCL` on
  *    local POSIX, atomic namenode create on HDFS). Exactly one writer per
  *    version wins; losers re-read the new latest snapshot and retry at
  *    N+1. Plain rename is NOT the primitive because POSIX `rename(2)`
  *    silently overwrites an existing destination — two "successful"
  *    renames to the same manifest would lose a commit.
  *  - **Atomic visibility via tmp + rename**: the lock holder writes the
  *    manifest body to `_log/.tmp-<uuid>` and renames it to `vN.txt`.
  *    Readers list only `v*.txt`, so they see either nothing or the whole
  *    manifest, never a partial file.
  *
  * Data files are immutable: every commit writes its parquet under a fresh
  * `data/<uuid>/` directory and the manifest names the set of directories
  * alive in that snapshot. Readers pin one manifest, so a query planned at
  * version N is unaffected by any later commit (snapshot isolation), and
  * `snapshotAt` gives time travel for free. The manifest also carries the
  * schema DDL, so an empty table stays readable and reads skip footer
  * inference.
  *
  * Semantics by operation:
  *  - `append`: new dirs = old dirs + one; conflicts retry cheaply (the
  *    data dir is already written; only the manifest CAS re-runs).
  *  - `overwrite`: new dirs = exactly one.
  *  - `merge`: copy-on-write MERGE (last-write-wins upsert on a key): the
  *    rewritten table lands in one new dir. A conflict means the base
  *    snapshot changed, so the rewrite itself recomputes against the new
  *    snapshot before retrying — the result is always a serializable
  *    history. At 100 TB the rewrite set should be pruned to affected
  *    partitions/files via min-max stats; this implementation rewrites the
  *    full table (correct, pessimistic) and documents that as the scale
  *    follow-up.
  *
  * Failure notes (documented trade-offs, mirrored in ManifestTableSpec):
  *  - A writer that dies between reserving `vN.lock` and publishing
  *    `vN.txt` leaves an orphan lock; later writers exhaust retries and
  *    fail loudly naming the lock to remove. (Delta has the same class of
  *    issue with orphaned staging state; a TTL-based breaker needs a clock
  *    authority this build doesn't assume.)
  *  - `vacuum(retainLast)` deletes data dirs unreferenced by the newest K
  *    manifests; time travel older than that stops working, like Delta's
  *    `VACUUM` past the retention window.
  *  - Object stores without atomic exclusive-create (S3 pre-conditional-PUT)
  *    need a coordinator; same caveat as every log-structured format.
  */
final class ManifestTable private (spark: SparkSession, rootStr: String) {
  import ManifestTable._

  private val root = new Path(rootStr)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def logDir = new Path(root, "_log")
  private def dataDir = new Path(root, "data")

  // ---------------------------------------------------------------- reads

  /** Versions with a published manifest, ascending. */
  def versions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).iterator
      .map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .toSeq.sorted
  }

  def latestVersion(): Option[Long] = versions().lastOption

  /** The table as of its newest commit. Fails on a never-committed table. */
  def snapshot(): DataFrame =
    snapshotAt(latestVersion().getOrElse(
      throw new IllegalStateException(s"ManifestTable $rootStr: no commits yet")))

  /** Time travel: the table exactly as committed at `version`. The file set
    * is pinned from that one manifest, so later commits (or concurrent
    * writers) cannot change what this DataFrame reads.
    */
  def snapshotAt(version: Long): DataFrame = {
    val m = readManifest(version)
    val reader = spark.read.schema(StructType.fromDDL(m.schemaDdl))
    if (m.dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], StructType.fromDDL(m.schemaDdl))
    else reader.parquet(m.dirs.map(d => new Path(dataDir, d).toString): _*)
  }

  // --------------------------------------------------------------- writes

  /** Replace the table contents atomically. Returns the committed version. */
  def overwrite(df: DataFrame, maxRetries: Int = DefaultRetries): Long = {
    val dir = writeData(df)
    commitWithRetry(maxRetries, "overwrite", df.schema.toDDL, _ => Seq(dir))
  }

  /** Append a batch atomically. The data is written once; only the manifest
    * CAS re-runs on a conflict. Returns the committed version.
    */
  def append(df: DataFrame, maxRetries: Int = DefaultRetries): Long = {
    val dir = writeData(df)
    commitWithRetry(maxRetries, "append", df.schema.toDDL,
      prev => prev.map(_.dirs).getOrElse(Seq.empty) :+ dir)
  }

  /** Copy-on-write MERGE: last-write-wins upsert of `updates` by `keys`
    * (exactly [[Aggregates.upsert]]'s semantics, including null-safe key
    * matching), committed atomically. On a CAS conflict the rewrite is
    * recomputed against the winner's snapshot, so concurrent merges
    * serialize instead of losing updates. Returns the committed version.
    */
  def merge(updates: DataFrame, keys: Seq[String], maxRetries: Int = DefaultRetries): Long = {
    var attempt = 0
    while (true) {
      val base = latestVersion()
      val merged = base match {
        case Some(v) => Aggregates.upsert(snapshotAt(v), updates, keys)
        case None    => updates.dropDuplicates(keys)
      }
      val dir = writeData(merged)
      // single-shot commit: a conflict must re-derive the merge input, not
      // just re-CAS the same rewrite (that would silently drop the
      // conflicting winner's rows)
      commitOnce("merge", merged.schema.toDDL, _ => Seq(dir), parentGuard = Some(base)) match {
        case Some(v) => return v
        case None =>
          attempt += 1
          if (attempt > maxRetries) failRetries(maxRetries)
          Thread.sleep(RetrySleepMs * attempt)
      }
    }
    -1L // unreachable
  }

  /** Delete data directories not referenced by the newest `retainLast`
    * manifests. Time travel older than the retained window stops working
    * (same contract as Delta VACUUM past retention). Returns deleted dirs.
    */
  def vacuum(retainLast: Int = 1): Seq[String] = {
    require(retainLast >= 1, "vacuum: must retain at least the latest version")
    val keep = versions().takeRight(retainLast)
      .flatMap(v => readManifest(v).dirs).toSet
    if (!fs.exists(dataDir)) return Seq.empty
    val dead = fs.listStatus(dataDir).iterator.map(_.getPath.getName)
      .filterNot(keep).toSeq
    dead.foreach(d => fs.delete(new Path(dataDir, d), /* recursive = */ true))
    dead
  }

  // ------------------------------------------------------------ internals

  private def writeData(df: DataFrame): String = {
    val dir = java.util.UUID.randomUUID().toString
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dataDir, dir).toString)
    dir
  }

  private def commitWithRetry(maxRetries: Int, action: String, schemaDdl: String,
                              dirs: Option[Manifest] => Seq[String]): Long = {
    var attempt = 0
    while (true) {
      commitOnce(action, schemaDdl, dirs, parentGuard = None) match {
        case Some(v) => return v
        case None =>
          attempt += 1
          if (attempt > maxRetries) failRetries(maxRetries)
          Thread.sleep(RetrySleepMs * attempt)
      }
    }
    -1L // unreachable
  }

  /** One CAS attempt at version latest+1. None = lost the race (or, with a
    * `parentGuard`, the latest version is no longer the guarded one —
    * including a fresh table that gained its first commit): re-derive and
    * retry. `parentGuard = Some(p)` means "commit only on top of exactly
    * p"; plain None means "on top of whatever is latest".
    */
  private def commitOnce(action: String, schemaDdl: String,
                         dirs: Option[Manifest] => Seq[String],
                         parentGuard: Option[Option[Long]]): Option[Long] = {
    fs.mkdirs(logDir)
    val prevV = latestVersion()
    if (parentGuard.exists(_ != prevV)) return None
    val prev = prevV.map(readManifest)
    val next = prevV.getOrElse(-1L) + 1
    if (!tryReserve(next)) {
      // a reserved-but-never-published version means a writer died mid-commit
      // (or is slow); the retry loop re-lands here until retries exhaust
      return None
    }
    val body = new StringBuilder()
      .append(Magic).append('\n')
      .append(s"version=$next\n")
      .append(s"action=$action\n")
      .append(s"schema=$schemaDdl\n")
    dirs(prev).foreach(d => body.append(s"dir=$d\n"))
    val tmp = new Path(logDir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, /* overwrite = */ false)
    try out.write(body.toString.getBytes(UTF_8)) finally out.close()
    // no contention on the final name — the lock made us the sole writer of
    // this version; the rename is only for atomic reader visibility
    if (!fs.rename(tmp, manifestPath(next))) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"ManifestTable $rootStr: rename to ${manifestPath(next)} failed while holding its lock")
    }
    Some(next)
  }

  /** The CAS primitive: create-if-absent of the version's lock file.
    * `java.io.File.createNewFile` is atomic `O_CREAT|O_EXCL` for the local
    * scheme (Hadoop's RawLocalFileSystem check-then-create is NOT atomic);
    * HDFS `create(overwrite = false)` is an atomic namenode op.
    */
  private def tryReserve(version: Long): Boolean = {
    val lock = lockPath(version)
    if (fs.getScheme == "file")
      new java.io.File(lock.toUri.getPath).createNewFile()
    else
      try { fs.create(lock, /* overwrite = */ false).close(); true }
      catch { case _: java.io.IOException => false }
  }

  private def failRetries(maxRetries: Int): Nothing = {
    val orphan = latestVersion().getOrElse(-1L) + 1
    throw new java.io.IOException(
      s"ManifestTable $rootStr: commit failed after $maxRetries retries; if no " +
      s"writer is live, a crashed commit left an orphan lock — remove ${lockPath(orphan)}")
  }

  private def manifestPath(v: Long) = new Path(logDir, f"v$v%020d.txt")
  private def lockPath(v: Long) = new Path(logDir, f"v$v%020d.lock")

  private def readManifest(v: Long): Manifest = {
    val in = fs.open(manifestPath(v))
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, UTF_8)
    } finally in.close()
    val lines = text.split('\n')
    require(lines.headOption.contains(Magic),
      s"ManifestTable $rootStr: v$v is not a graft manifest")
    def field(k: String): String = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }.getOrElse(sys.error(s"ManifestTable $rootStr: v$v missing field '$k'"))
    Manifest(field("version").toLong, field("action"), field("schema"),
      lines.toSeq.collect { case l if l.startsWith("dir=") => l.substring(4) })
  }
}

object ManifestTable {
  private val Magic = "graft-manifest-v1"
  private val DefaultRetries = 10
  private val RetrySleepMs = 50L
  private val ManifestName = """v(\d{20})\.txt""".r

  private final case class Manifest(
      version: Long, action: String, schemaDdl: String, dirs: Seq[String])

  def apply(spark: SparkSession, root: String): ManifestTable =
    new ManifestTable(spark, root)
}

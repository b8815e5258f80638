package graft.ops

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min, when}
import org.apache.spark.sql.types._

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
  *  - `merge`: copy-on-write MERGE (last-write-wins upsert on a key): see
  *    below. A conflict means the base snapshot changed, so the rewrite
  *    itself recomputes against the new snapshot before retrying — the
  *    result is always a serializable history.
  *
  * **Stats-pruned merge** (the 100-TB form — same plan Delta/Iceberg use):
  * when the table is built with `statsCols`, each commit records per-dir
  * min/max + has-null for those columns (one tiny aggregation over the
  * just-written files), and `merge` rewrites ONLY the dirs whose key range
  * can overlap the update batch's hull — every provably-disjoint dir
  * survives into the new manifest untouched. Pruning is conservative by
  * construction:
  *  - a dir is skipped only if SOME key column's ranges are disjoint AND
  *    the null populations cannot meet (`<=>` matches null to null, and
  *    min/max ignore nulls — so has-null is tracked separately);
  *  - stats are kept for integral/floating/decimal columns only (string
  *    ordering differs between JVM compare and Spark's binary collation,
  *    and a wrong prune is a lost update, so strings never prune);
  *  - unparseable bounds (NaN/Infinity), missing stats, or a type-changing
  *    upsert (schema coercion) all fall back to rewriting.
  *
  * Failure notes (documented trade-offs, mirrored in ManifestTableSpec):
  *  - A writer whose PROCESS dies between reserving `vN.lock` and
  *    publishing `vN.txt` leaves an orphan lock; later writers exhaust
  *    retries and fail loudly naming the lock to remove. (A live writer
  *    hitting an IO failure releases its own lock on the way out.)
  *    [[breakOrphanLock]] is the fenced admin unblock: it refuses when the
  *    version is actually published, and the caller asserts no writer is
  *    live (a TTL-based AUTOMATIC breaker would need a clock authority
  *    this build doesn't assume — Delta has the same stance on orphaned
  *    staging state).
  *  - `vacuum(retainLast)` deletes data dirs unreferenced by the newest K
  *    manifests; time travel older than that stops working, like Delta's
  *    `VACUUM` past the retention window.
  *  - The `_log` itself is append-only and never pruned: every commit adds
  *    one manifest (plus one lock file on the Hadoop store). NO read path
  *    pays for that growth anymore: `latestVersion()` keeps a per-handle
  *    lower bound and probes FORWARD (versions are dense), so a steady-
  *    state commit costs one miss-probe, and every Kth commit writes the
  *    advisory `_ckpt` hint (Delta's `_last_checkpoint` analog — version +
  *    manifest body, last-writer-wins, validated on read) so a COLD
  *    handle's first resolve is one read + <K probes, and `versions()`
  *    (time travel, vacuum) derives `0..latest` from version density
  *    instead of LISTing. The full LIST remains only as the fallback for
  *    absent/invalid hints. Storage still accumulates one small object per
  *    commit — pruning published manifests would break time travel, which
  *    is vacuum's documented contract to bound, not the log's.
  *  - On an object store, build with [[ManifestTable.onObjectStore]]: the
  *    CAS primitive becomes ONE conditional PUT of the manifest itself
  *    ([[ObjectStoreLogStore]]), the orphan-lock mode disappears, and the
  *    rest of the protocol is unchanged. Stores without any conditional
  *    write (S3 pre-2024) need a coordinator; same caveat as every
  *    log-structured format.
  */
final class ManifestTable private (
    spark: SparkSession, rootStr: String, statsCols: Seq[String],
    log: ManifestLogStore, checkpointInterval: Int) {
  import ManifestTable._

  private val root = new Path(rootStr)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dataDir = new Path(root, "data")

  // ---------------------------------------------------------------- reads

  /** Versions with a published manifest, ascending. Versions are DENSE by
    * the commit protocol (commitOnce: next = latest + 1 always, first
    * commit = 0), so the list is `0..latest` — derived from
    * [[latestVersion]] (checkpoint hint + forward probes) rather than the
    * O(commits) `_log` LIST the pre-checkpoint form paid on every vacuum
    * and time-travel listing.
    */
  def versions(): Seq[Long] = latestVersion() match {
    case None => Seq.empty
    case Some(v) => 0L to v
  }

  // A LOWER BOUND on the latest committed version, per table handle —
  // the cure for the documented _log scale trade (see the class doc's
  // failure notes): latestVersion() sits on the hot path of EVERY commit
  // and snapshot, and a full `_log` LIST there grows O(commits) on
  // long-lived streaming tables (a million triggers = a million-entry
  // listing, paginated and billed on S3). Versions are DENSE
  // (commitOnce: next = latest + 1 always) and manifests immutable, so
  // once any version is known, the true latest is found by probing
  // FORWARD one version at a time — in the steady state that is ONE
  // cached-manifest hit per foreign commit plus ONE miss, independent of
  // history length. Data races on the @volatile are benign (the bound
  // only ever advances; a lost write costs an extra probe, never a wrong
  // answer); a stale bound from another process's commits is caught up
  // by the same probe walk. Cold handles (bound unset) pay one full LIST
  // and then never again.
  @volatile private var latestSeen: Long = -1L
  private def advanceSeen(v: Long): Unit = { if (v > latestSeen) latestSeen = v }

  def latestVersion(): Option[Long] = {
    val base = latestSeen
    if (base < 0L) {
      // COLD handle: the checkpoint hint (when the store has one) names a
      // known-committed version to probe forward from — one read + ≤K
      // probes instead of the full O(commits) LIST; absent/invalid hints
      // fall back to the LIST exactly as before
      checkpointBase() match {
        case Some(cv) =>
          var v = cv
          while (log.exists(v + 1)) v += 1
          advanceSeen(v)
          Some(v)
        case None =>
          val v = log.listVersions().lastOption
          v.foreach(advanceSeen)
          v
      }
    } else {
      // body-free probes (filesystem exists / object HEAD): a fallen-
      // behind handle pays one HEAD per foreign commit plus one miss;
      // manifests the caller actually reads still land in the cache via
      // readManifest as before
      var v = base
      while (log.exists(v + 1)) v += 1
      advanceSeen(v)
      Some(v)
    }
  }

  /** Validated checkpoint hint: the checkpointed version, provided its
    * manifest actually EXISTS in the log (the guard against a stale
    * pointer over an externally deleted-and-recreated root — advisory
    * data never produces a phantom version). The embedded manifest body
    * warms the cache, so a cold start that trusts the hint costs zero
    * extra manifest GETs. Any parse/IO failure reads as "no hint".
    */
  private def checkpointBase(): Option[Long] =
    try {
      log.readCheckpoint().flatMap(parseCheckpoint).flatMap { case (v, body) =>
        if (!log.exists(v)) None
        else {
          if (manifestCache.size >= ManifestCacheMax) manifestCache.clear()
          manifestCache.put(v, parseManifest(v, body))
          Some(v)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseCheckpoint(bytes: Array[Byte]): Option[(Long, Array[Byte])] = {
    val lines = new String(bytes, UTF_8).split('\n')
    if (!lines.headOption.contains(CkptMagic)) return None
    def field(k: String): Option[String] = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }
    for {
      v <- field("version").flatMap(_.toLongOption)
      m <- field("manifest")
    } yield (v, dec(m).getBytes(UTF_8))
  }

  /** The table as of its newest commit. Fails on a never-committed table. */
  def snapshot(): DataFrame = {
    def latest = latestVersion().getOrElse(
      throw new IllegalStateException(s"ManifestTable $rootStr: no commits yet"))
    try snapshotAt(latest)
    catch {
      case _: java.io.FileNotFoundException if latestSeen < 0L =>
        // the append-only-contract guard fired (readManifest missed a
        // version at or below the handle's lower bound: the root was
        // externally deleted and recreated) — the bound and cache were
        // reset, so ONE re-resolve now reflects the new log instead of
        // failing confusingly on the phantom version
        snapshotAt(latest)
    }
  }

  /** Time travel: the table exactly as committed at `version`. The file set
    * is pinned from that one manifest, so later commits (or concurrent
    * writers) cannot change what this DataFrame reads.
    */
  def snapshotAt(version: Long): DataFrame = {
    val m = readManifest(version)
    readDirs(m, m.dirs)
  }

  /** CDC between two committed versions: full-row changes from `fromV` to
    * `toV`, tagged `_change` = "insert" (row present only in `toV`) or
    * "delete" (only in `fromV`); an update surfaces as delete + insert of
    * the key's old/new rows. Row identity is the WHOLE row (the table
    * format stores plain rows, not keys), and MULTIPLICITY is part of the
    * change: EXCEPT ALL emits the count delta, so a row going 2× → 5×
    * yields three "insert" rows — apply-once consumers get the exact
    * multiset difference, not a deduplicated summary.
    *
    * The tag column name `_change` is reserved: a table that already has
    * it is rejected (the same stance Delta takes with `_change_type` —
    * silently replacing the user's column would corrupt the CDC output).
    * Schema changes between the versions are rejected by comparing the
    * manifests' schema DDL (names AND types — a type-widening overwrite
    * must not silently coerce into an empty diff).
    *
    * Scale: two snapshot reads + two EXCEPT ALL set-ops on all columns —
    * each a single shuffle on the row hash, never a driver
    * materialization. Version pruning does NOT apply (a diff must read
    * both full snapshots; incremental CDC would require key metadata the
    * manifest deliberately doesn't carry).
    */
  def diff(fromV: Long, toV: Long): DataFrame = {
    val (mFrom, mTo) = (readManifest(fromV), readManifest(toV))
    require(mFrom.schemaDdl == mTo.schemaDdl,
      s"ManifestTable $rootStr: diff across a schema change ($fromV [${mFrom.schemaDdl}] -> " +
        s"$toV [${mTo.schemaDdl}]) is not defined")
    val before = readDirs(mFrom, mFrom.dirs)
    val after = readDirs(mTo, mTo.dirs)
    require(!after.columns.map(_.toLowerCase).contains("_change"),
      s"ManifestTable $rootStr: diff reserves the _change column; the table already has one")
    val ins = after.exceptAll(before).withColumn("_change", lit("insert"))
    val del = before.exceptAll(after).withColumn("_change", lit("delete"))
    ins.unionByName(del)
  }

  private def readDirs(m: Manifest, dirs: Seq[String]): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    if (dirs.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs.map(d => new Path(dataDir, d).toString): _*)
  }

  // --------------------------------------------------------------- writes

  /** Replace the table contents atomically. Returns the committed version. */
  def overwrite(df: DataFrame, maxRetries: Int = DefaultRetries): Long = {
    val (dir, stats) = writeData(df)
    commitWithRetry(maxRetries, "overwrite", normDdl(df.schema), _ => Seq(dir), stats)
  }

  /** Append a batch atomically. The data is written once; only the manifest
    * CAS re-runs on a conflict. The batch's schema must equal the table's
    * (modulo nullability): schema evolution is NOT supported, and silently
    * committing a drifted schema would make every existing dir unreadable
    * (or silently drop a column from the whole table) — `overwrite` is the
    * schema-changing operation. Returns the committed version.
    */
  def append(df: DataFrame, maxRetries: Int = DefaultRetries): Long = {
    val ddl = normDdl(df.schema)
    // fail-fast BEFORE materializing the batch: a drifted schema is fully
    // predictable from one (cached) manifest read, and failing after
    // writeData costs a complete data write plus an orphan dir for vacuum.
    // The in-callback require below stays authoritative under races (an
    // interleaved overwrite can change the schema after this check).
    latestVersion().map(readManifest).foreach(requireSameSchema(_, ddl))
    val (dir, stats) = writeData(df)
    commitWithRetry(maxRetries, "append", ddl,
      prev => {
        prev.foreach(requireSameSchema(_, ddl))
        prev.map(_.dirs).getOrElse(Seq.empty) :+ dir
      }, stats)
  }

  /** [[append]], except an EMPTY batch commits nothing (no version, no
    * empty dir) and returns None — the gate a per-trigger streaming sink
    * needs, WITHOUT the separate pre-count job the caller-side
    * `if (df.count() > 0) append(df)` idiom pays: the row count rides the
    * write itself as an observed metric (`Dataset.observe` /
    * CollectMetrics — collected by the write's own tasks, zero extra
    * scheduling rounds), and on zero rows the freshly written dir is
    * deleted best-effort instead of committed. Versioning is identical to
    * the caller-side gate: empty triggers leave the log untouched.
    */
  def appendNonEmpty(df: DataFrame, maxRetries: Int = DefaultRetries): Option[Long] = {
    val ddl = normDdl(df.schema)
    latestVersion().map(readManifest).foreach(requireSameSchema(_, ddl))
    val obs = org.apache.spark.sql.Observation()
    val (dir, stats) = writeData(df.observe(obs, count(lit(1)).as("rows")))
    if (obs.get("rows").asInstanceOf[Long] == 0L) {
      bestEffortDelete(dir, "empty-batch dir")
      None
    } else Some(commitWithRetry(maxRetries, "append", ddl,
      prev => {
        prev.foreach(requireSameSchema(_, ddl))
        prev.map(_.dirs).getOrElse(Seq.empty) :+ dir
      }, stats))
  }

  /** Exactly-once APPEND for a streaming sink: commit the batch atomically
    * WITH its `(sinkId, batchId)` transaction token, or recognize that this
    * token (or a later one) already committed and do nothing — the
    * SetTransaction idempotence Delta gives `foreachBatch` writers. The
    * token rides the manifest itself, so the dedup decision and the commit
    * are ONE conditional PUT: a replayed micro-batch (restart after a
    * crash between commit and checkpoint, or a zombie attempt racing its
    * replacement) either loses the CAS and then observes its token on the
    * new latest, or observes it up front — in both cases it deletes its
    * orphan data dir and reports the already-committed version. Tokens are
    * carried forward by every subsequent commit (any action, any writer),
    * so the lookup is O(1) on the latest manifest rather than a log replay.
    * `batchId` must be monotonically increasing per `sinkId` (Structured
    * Streaming's epoch contract): "applied" means a token `>= batchId`
    * exists. Returns the version at which the batch is visible.
    */
  def appendOnce(df: DataFrame, sinkId: String, batchId: Long,
                 maxRetries: Int = DefaultRetries): Long = {
    require(sinkId.nonEmpty, "appendOnce: sinkId must be non-empty")
    def appliedAt(base: Option[Long]): Boolean =
      base.exists(v => readManifest(v).txns.get(sinkId).exists(_ >= batchId))
    // fast path BEFORE writing any data: a routine restart replay costs
    // one manifest read, not a parquet write + orphan delete
    val first = latestVersion()
    if (appliedAt(first)) return first.get
    val ddl = normDdl(df.schema)
    // same fail-fast-before-write rationale as append's pre-check
    first.map(readManifest).foreach(requireSameSchema(_, ddl))
    val (dir, stats) = writeData(df)
    var attempt = 0
    while (true) {
      val base = latestVersion()
      if (appliedAt(base)) {
        // a racing attempt of the same batch won: our dir is an orphan
        bestEffortDelete(dir, "duplicate-batch dir")
        return base.get
      }
      // parentGuard pins the dedup decision to the exact manifest this
      // commit publishes on top of — check and commit are atomic under
      // the CAS (one conditional PUT on the object-store log)
      commitOnce("append", ddl,
          prev => {
            prev.foreach(requireSameSchema(_, ddl))
            prev.map(_.dirs).getOrElse(Seq.empty) :+ dir
          }, stats, parentGuard = Some(base), txn = Some(sinkId -> batchId)) match {
        case Some(v) => return v
        case None =>
          attempt += 1
          if (attempt > maxRetries) failRetries(maxRetries)
          Thread.sleep(RetrySleepMs * attempt)
      }
    }
    -1L // unreachable
  }

  /** The newest committed `batchId` for `sinkId`, if any — the recovery
    * question an exactly-once sink asks ([[appendOnce]]'s token store).
    */
  def txnVersion(sinkId: String): Option[Long] =
    latestVersion().flatMap(v => readManifest(v).txns.get(sinkId))

  /** Copy-on-write MERGE: last-write-wins upsert of `updates` by `keys`
    * (exactly [[Aggregates.upsert]]'s semantics, including null-safe key
    * matching), committed atomically. With `statsCols` covering a key, only
    * range-overlapping dirs are rewritten (see class doc); without, the
    * whole table rewrites. On a CAS conflict the rewrite is recomputed
    * against the winner's snapshot. Returns the committed version.
    */
  def merge(updates: DataFrame, keys: Seq[String], maxRetries: Int = DefaultRetries): Long =
    mergeCore(updates, keys, maxRetries, txn = None)

  /** Exactly-once MERGE: [[merge]] carrying the same `(sinkId, batchId)`
    * token as [[appendOnce]]. Last-write-wins alone absorbs a replayed
    * micro-batch only when NOTHING interleaved: if another writer updated
    * one of the batch's keys between the crash and the replay, re-merging
    * the stale batch would silently REVERT that writer's value. The token
    * makes the replay a provable no-op instead — checked against the exact
    * manifest the commit lands on (parentGuard), so the decision and the
    * commit are one conditional PUT. Returns the version at which the
    * batch is visible.
    */
  def mergeOnce(updates: DataFrame, keys: Seq[String], sinkId: String, batchId: Long,
                maxRetries: Int = DefaultRetries): Long = {
    require(sinkId.nonEmpty, "mergeOnce: sinkId must be non-empty")
    mergeCore(updates, keys, maxRetries, txn = Some(sinkId -> batchId))
  }

  private def mergeCore(updates: DataFrame, keys: Seq[String], maxRetries: Int,
                        txn: Option[(String, Long)]): Long = {
    // empty keys would silently collapse a fresh table's first commit to
    // ONE arbitrary row (dropDuplicates over no columns = global agg) or
    // crash opaquely inside the upsert's keys.reduce on a non-empty one
    require(keys.nonEmpty, "merge: at least one key column is required")
    var attempt = 0
    while (true) {
      val base = latestVersion()
      // the dedup check runs against the SAME base the commit is pinned to
      // (and re-runs after every lost CAS): a racing attempt of this batch
      // — or its first run, crashed after commit — is recognized here
      // before any rewrite work is spent
      txn.foreach { case (sid, b) =>
        if (base.exists(v => readManifest(v).txns.get(sid).exists(_ >= b)))
          return base.get
      }
      val (survivors, merged, scratch) = base match {
        case None => (Seq.empty[String], updates.dropDuplicates(keys), None)
        case Some(v) =>
          val m = readManifest(v)
          val statKeys = keys.filter(c => m.stats.values.exists(_.contains(c)))
          if (statKeys.isEmpty)
            (Seq.empty[String], Aggregates.upsert(readDirs(m, m.dirs), updates, keys), None)
          else {
            // The prune decision and the written rows MUST come from the
            // same execution of the updates plan: a nondeterministic source
            // (sampling, files changing between jobs) could otherwise write
            // keys the hull never saw, landing duplicates in a pruned dir.
            // So the batch is materialized to a scratch dir first and both
            // the hull and the upsert read those bytes. The scratch dir is
            // never referenced by a manifest; it is deleted after commit.
            val updDir = writeRaw(updates, ScratchPrefix)
            val updRead = spark.read.schema(updates.schema)
              .parquet(new Path(dataDir, updDir).toString)
            val hull = updatesHull(updRead, statKeys)
            val (keep, rewrite) =
              m.dirs.partition(d => provablyDisjoint(m.stats.getOrElse(d, Map.empty), hull))
            val mergedAll =
              if (rewrite.isEmpty) updRead.dropDuplicates(keys)
              else Aggregates.upsert(readDirs(m, rewrite), updRead, keys)
            // a type-coercing upsert (e.g. decimal base × double updates)
            // would give surviving dirs a schema their parquet can't serve —
            // fall back to a full rewrite in that case (nullability is
            // excluded from the comparison: file reads are always nullable)
            if (keep.nonEmpty && normDdl(mergedAll.schema) != m.schemaDdl)
              (Seq.empty[String], Aggregates.upsert(readDirs(m, m.dirs), updRead, keys), Some(updDir))
            else (keep, mergedAll, Some(updDir))
          }
      }
      val (dir, stats) = writeData(merged)
      scratch.foreach(bestEffortDelete(_, "merge scratch dir"))
      // single-shot commit: a conflict must re-derive the merge input, not
      // just re-CAS the same rewrite (that would silently drop the
      // conflicting winner's rows)
      commitOnce("merge", normDdl(merged.schema), prev => survivors :+ dir, stats,
          parentGuard = Some(base), txn = txn) match {
        case Some(v) => return v
        case None =>
          // the losing attempt's rewrite dir is referenced by no manifest —
          // delete it now rather than leaving a table-sized orphan per
          // retry for vacuum to find
          bestEffortDelete(dir, "conflict-losing dir")
          attempt += 1
          if (attempt > maxRetries) failRetries(maxRetries)
          Thread.sleep(RetrySleepMs * attempt)
      }
    }
    -1L // unreachable
  }

  /** GDPR-style keyed DELETE through the same COW commit protocol:
    * tombstone keys anti-join the affected dirs, dirs provably disjoint
    * from the tombstone hull survive untouched (the merge prune), and
    * the result commits as a new version — prior versions still serve
    * the deleted rows (time travel) until [[vacuum]] reclaims them,
    * which is exactly the audit-then-reclaim shape a right-to-be-
    * forgotten pipeline needs. A delete that can touch nothing returns
    * the current version without writing (no empty-dir churn).
    */
  def deleteByKeys(tombstones: DataFrame, keys: Seq[String],
                   maxRetries: Int = DefaultRetries): Long = {
    require(keys.nonEmpty)
    var attempt = 0
    while (true) {
      val base = latestVersion()
      base match {
        case None => return -1L
        case Some(v) =>
          val m = readManifest(v)
          val statKeys = keys.filter(c => m.stats.values.exists(_.contains(c)))
          // same single-execution discipline as merge: the prune hull and
          // the anti join must read the SAME materialized tombstone bytes
          // col with backticks, not selectExpr: a dotted/expression-like
          // key name that merge accepts (Aggregates.upsert quotes exactly
          // this way) must not be re-parsed as a nested-field path here
          val tombSel = tombstones.select(keys.map(k => col(s"`$k`")): _*)
            .dropDuplicates(keys)
          val tombDir = writeRaw(tombSel, ScratchPrefix)
          // schema pinned like merge's scratch read: an EMPTY tombstone
          // batch can land zero data files, and a bare read would die on
          // footer inference before the no-op early return below — plus
          // the pin keeps the key types the anti-join condition was
          // planned against (and skips a footer-inference round trip)
          val tRead = spark.read.schema(tombSel.schema)
            .parquet(new Path(dataDir, tombDir).toString)
          // a delete with nothing to delete must be the advertised no-op —
          // without this, empty tombstones rewrite the WHOLE table (no
          // stats ⇒ every dir is "affected"; with stats, an empty hull has
          // no provable bounds so nothing prunes either). One limit-1
          // probe over the just-written scratch bytes.
          if (tRead.isEmpty) {
            bestEffortDelete(tombDir, "tombstone scratch dir")
            return v
          }
          val (keep, rewrite) =
            if (statKeys.isEmpty) (Seq.empty[String], m.dirs)
            else {
              val hull = updatesHull(tRead, statKeys)
              m.dirs.partition(d => provablyDisjoint(m.stats.getOrElse(d, Map.empty), hull))
            }
          if (rewrite.isEmpty) {
            bestEffortDelete(tombDir, "tombstone scratch dir")
            return v
          }
          // NULL-SAFE anti join (the Aggregates.upsert convention): with
          // plain equality a null-key tombstone never matches a null-key
          // row, so a delete that reported success would silently leave
          // the null-key row behind — the exact right-to-be-forgotten
          // violation merge's <=> matching exists to prevent
          val src = readDirs(m, rewrite).alias("_del_b")
          val tomb = tRead.alias("_del_t")
          val cond = keys.map(k => col(s"_del_b.`$k`") <=> col(s"_del_t.`$k`"))
            .reduce(_ && _)
          val remaining = src.join(tomb, cond, "left_anti")
          val (dir, stats) = writeData(remaining)
          bestEffortDelete(tombDir, "tombstone scratch dir")
          commitOnce("delete", m.schemaDdl, _ => keep :+ dir, stats,
              parentGuard = Some(base)) match {
            case Some(nv) => return nv
            case None =>
              bestEffortDelete(dir, "conflict-losing delete dir")
              attempt += 1
              if (attempt > maxRetries) failRetries(maxRetries)
              Thread.sleep(RetrySleepMs * attempt)
          }
      }
    }
    -1L // unreachable
  }

  /** Number of data dirs a version's manifest references (default: the
    * latest) — the small-file observable [[compact]] exists to bound; a
    * monitoring loop alerts on its growth the same way it watches
    * [[graft.ops.Dedup.lshOversizedBuckets]].
    */
  def dirCount(version: Long = -1L): Int = {
    val v = if (version >= 0L) version
      else latestVersion().getOrElse(
        throw new IllegalStateException(s"ManifestTable $rootStr: no commits yet"))
    readManifest(v).dirs.length
  }

  /** OPTIMIZE-style compaction: rewrites the whole current dir set into
    * `numFiles` balanced files committed as ONE dir — the maintenance
    * operation an append-per-trigger table needs, since every append adds
    * a dir and small files accumulate without bound. The rows are
    * byte-identical (readers cannot observe a compaction except through
    * version numbers); prior versions still time-travel until [[vacuum]]
    * reclaims their dirs. Committed with a parent guard like [[merge]]: a
    * concurrent append/merge wins the CAS and the compaction RECOMPUTES
    * from the winner's snapshot — never discards the winner's rows. Size
    * `numFiles` at ~128-256 MB/file for the real table; per-column stats
    * are recomputed over the combined data so merge pruning keeps working.
    * Returns the committed version, or -1 when there is nothing to compact
    * (empty table or a single dir already).
    */
  def compact(numFiles: Int = 1, maxRetries: Int = DefaultRetries): Long = {
    require(numFiles >= 1)
    var attempt = 0
    while (true) {
      val base = latestVersion()
      base match {
        case None => return -1L
        case Some(v) =>
          val m = readManifest(v)
          if (m.dirs.length < 2) return -1L
          val (dir, stats) = writeData(readDirs(m, m.dirs).coalesce(numFiles))
          commitOnce("compact", m.schemaDdl, _ => Seq(dir), stats,
              parentGuard = Some(base)) match {
            case Some(nv) => return nv
            case None =>
              try fs.delete(new Path(dataDir, dir), /* recursive = */ true)
              catch { case scala.util.control.NonFatal(e) =>
                System.err.println(s"ManifestTable $rootStr: best-effort cleanup of " +
                  s"conflict-losing compaction dir $dir failed (vacuum will collect it): ${e.getMessage}")
              }
              attempt += 1
              if (attempt > maxRetries) failRetries(maxRetries)
              Thread.sleep(RetrySleepMs * attempt)
          }
      }
    }
    -1L // unreachable
  }

  /** Delete data directories not referenced by the newest `retainLast`
    * manifests. Time travel older than the retained window stops working
    * (same contract as Delta VACUUM past retention). Returns deleted dirs.
    *
    * `graceMs` protects IN-FLIGHT commits: a writer creates its data dir
    * BEFORE winning the manifest CAS, so an unreferenced-but-fresh dir may
    * be a commit about to publish — deleting it would let the commit
    * succeed pointing at vanished files. Dirs modified within the grace
    * window are skipped (Delta's retention-hours guard plays the same
    * role). Pass 0 only when no writer can be live.
    */
  def vacuum(retainLast: Int = 1, graceMs: Long = DefaultVacuumGraceMs): Seq[String] = {
    require(retainLast >= 1, "vacuum: must retain at least the latest version")
    val keep = versions().takeRight(retainLast)
      .flatMap(v => readManifest(v).dirs).toSet
    if (!fs.exists(dataDir)) return Seq.empty
    val now = System.currentTimeMillis()
    // the grace decision uses the NEWEST timestamp inside the dir, not the
    // directory entry's own: S3-class connectors report 0 (or a synthetic
    // value) for directory prefixes, which would make every in-flight dir
    // look ancient and defeat the guard on exactly the deployment
    // onObjectStore targets — the files inside carry real object mtimes
    def newestMTime(st: org.apache.hadoop.fs.FileStatus): Long = {
      def walk(p: Path): Seq[Long] = {
        // a concurrent best-effort cleanup (conflict loser, duplicate
        // batch, scratch collection) can delete a candidate mid-walk —
        // a vanished subtree reads as "hot" so THIS pass skips it (it is
        // already being collected) instead of aborting the whole vacuum
        val children =
          try fs.listStatus(p).toSeq
          catch { case _: java.io.FileNotFoundException => return Seq(Long.MaxValue) }
        children.flatMap(c =>
          if (c.isDirectory) walk(c.getPath) else Seq(c.getModificationTime))
      }
      (st.getModificationTime +: walk(st.getPath)).max
    }
    // scratch staging dirs get a longer grace: their mtime marks WRITE
    // completion, but a merge/delete READS them until its commit — the
    // regular grace would let a vacuum racing a long merge delete the
    // staging mid-read (crashed operations' scratch still collects, after
    // ScratchVacuumGraceMs)
    def cutoffFor(name: String): Long =
      now - (if (name.startsWith(ScratchPrefix)) math.max(graceMs, ScratchVacuumGraceMs)
             else graceMs)
    val dead = fs.listStatus(dataDir).iterator
      .filter(st => !keep(st.getPath.getName) &&
        newestMTime(st) < cutoffFor(st.getPath.getName))
      .map(_.getPath.getName).toSeq
    dead.foreach(d => fs.delete(new Path(dataDir, d), /* recursive = */ true))
    dead
  }

  // ------------------------------------------------- stats-pruned merge

  /** Min/max/has-null of the update batch per prunable key column — ONE tiny
    * aggregation job, only run when the manifest actually has stats to
    * prune against. Bounds use the batch's HULL, so a batch spanning the
    * whole key space prunes nothing (coarse but never wrong).
    */
  private def updatesHull(updates: DataFrame, cols: Seq[String]): Map[String, ColStat] = {
    val prunable = cols.filter(c =>
      updates.schema.fields.exists(f => f.name == c && isPrunableType(f.dataType)))
    if (prunable.isEmpty) return Map.empty
    // backtick-quoted like every other key reference in this file: an
    // unquoted dotted stats column ("a.b") would re-parse as a nested
    // field path and fail (or silently aggregate a struct field) AFTER
    // the parquet data already landed. The alias strings are matched
    // verbatim by Row.getAs, never re-parsed, so they stay unquoted.
    val aggs = prunable.flatMap(c => Seq(
      min(col(s"`$c`")).cast("string").as(s"min_$c"),
      max(col(s"`$c`")).cast("string").as(s"max_$c"),
      count(when(col(s"`$c`").isNull, lit(1))).as(s"nulls_$c")))
    val r = updates.agg(aggs.head, aggs.tail: _*).collect()(0)
    prunable.map { c =>
      c -> ColStat(
        Option(r.getAs[String](s"min_$c")),
        Option(r.getAs[String](s"max_$c")),
        r.getAs[Long](s"nulls_$c") > 0)
    }.toMap
  }

  /** True only when NO row of the dir can key-match ANY update row: some key
    * column's value ranges are disjoint and its null populations cannot
    * meet. Any missing or unparseable bound ⇒ not provable ⇒ rewrite.
    */
  private def provablyDisjoint(dirStats: Map[String, ColStat],
                               hull: Map[String, ColStat]): Boolean =
    hull.exists { case (c, u) =>
      dirStats.get(c).exists { d =>
        val nullsCantMeet = !(d.hasNull && u.hasNull)
        val rangesDisjoint = (for {
          dMin <- d.min.flatMap(num); dMax <- d.max.flatMap(num)
          uMin <- u.min.flatMap(num); uMax <- u.max.flatMap(num)
        } yield dMax.compareTo(uMin) < 0 || uMax.compareTo(dMin) < 0)
          .getOrElse(
            // a side with NO non-null values (bounds absent) has an empty
            // value range — disjoint from anything; parse failures land
            // here too via num=None on a PRESENT bound, so distinguish:
            (d.min.isEmpty && d.max.isEmpty) || (u.min.isEmpty && u.max.isEmpty))
        nullsCantMeet && rangesDisjoint
      }
    }

  /** Manifest schemas are stored top-level-nullable: the DDL's only job is
    * READING the dirs, and file sources force nullable anyway — keeping the
    * writer's NOT NULL markers would make every schema-equality check
    * (merge's coercion guard) spuriously fail against read-back schemas.
    */
  private def normDdl(schema: StructType): String =
    StructType(schema.fields.map(_.copy(nullable = true))).toDDL

  private def num(s: String): Option[java.math.BigDecimal] =
    try Some(new java.math.BigDecimal(s)) catch { case _: NumberFormatException => None }

  /** Only types whose string round-trip orders identically to Spark's own
    * comparison. Strings/dates/timestamps are excluded on purpose — a
    * collation mismatch would prune a dir that overlaps, losing updates.
    */
  private def isPrunableType(t: DataType): Boolean = t match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  // ------------------------------------------------------------ internals

  /** Writes a batch to a fresh dir with NO stats pass (used for merge's
    * scratch materialization of the update batch).
    */
  /** Best-effort delete of a data-dir that NO manifest references: a
    * transient FS error collecting an orphan must never abort an operation
    * whose real work already succeeded — the orphan stays vacuum's to
    * collect, exactly as if the delete had not been attempted.
    */
  private def bestEffortDelete(dir: String, what: String): Unit =
    try { fs.delete(new Path(dataDir, dir), /* recursive = */ true); () }
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"ManifestTable $rootStr: best-effort cleanup of " +
        s"$what $dir failed (vacuum will collect it): ${e.getMessage}")
    }

  /** The one schema-evolution guard, shared by every append path. */
  private def requireSameSchema(prev: Manifest, ddl: String): Unit =
    require(prev.schemaDdl == ddl,
      s"ManifestTable $rootStr: append schema [$ddl] does not match table " +
        s"schema [${prev.schemaDdl}] — schema evolution is not supported; use overwrite")

  /** `prefix` distinguishes SCRATCH dirs (merge/delete single-execution
    * staging — consumed by the same operation, never referenced by a
    * manifest) from committed data dirs: [[vacuum]] grants scratch dirs a
    * longer grace so a long-running merge cannot have its staging deleted
    * mid-read (see [[ScratchVacuumGraceMs]]).
    */
  private def writeRaw(df: DataFrame, prefix: String = ""): String = {
    val dir = prefix + java.util.UUID.randomUUID().toString
    df.write.mode(SaveMode.ErrorIfExists).parquet(new Path(dataDir, dir).toString)
    dir
  }

  /** Writes the batch to a fresh dir; when stats are enabled, reads the
    * WRITTEN files back for min/max/has-null (immune to a nondeterministic
    * input plan re-executing differently — the stats describe the bytes on
    * disk, nothing else).
    */
  private def writeData(df: DataFrame): (String, Map[String, ColStat]) = {
    val dir = writeRaw(df)
    val prunable = statsCols.filter(c =>
      df.schema.fields.exists(f => f.name == c && isPrunableType(f.dataType)))
    if (prunable.isEmpty) (dir, Map.empty)
    else {
      val written = spark.read.schema(df.schema)
        .parquet(new Path(dataDir, dir).toString)
      (dir, updatesHull(written, prunable))
    }
  }

  private def commitWithRetry(maxRetries: Int, action: String, schemaDdl: String,
                              dirs: Option[Manifest] => Seq[String],
                              newStats: Map[String, ColStat]): Long = {
    var attempt = 0
    while (true) {
      commitOnce(action, schemaDdl, dirs, newStats, parentGuard = None) match {
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
    * p"; plain None means "on top of whatever is latest". `newStats` are
    * the stats of the LAST dir the callback returns (the freshly written
    * one); surviving dirs inherit their stats from the parent manifest.
    */
  private def commitOnce(action: String, schemaDdl: String,
                         dirs: Option[Manifest] => Seq[String],
                         newStats: Map[String, ColStat],
                         parentGuard: Option[Option[Long]],
                         txn: Option[(String, Long)] = None): Option[Long] = {
    // a guarded commit trusts the caller's just-read latest instead of
    // re-LISTing (halving LIST traffic on the billed path): versions are
    // DENSE (next = latest+1 always), so if the real latest has moved past
    // the guard, guarded+1 already exists and the conditional PUT itself
    // rejects the attempt — the CAS is the staleness check
    val prevV = parentGuard.getOrElse(latestVersion())
    val prev = prevV.map(readManifest)
    val next = prevV.getOrElse(-1L) + 1
    // everything that can fail for non-race reasons (schema validation in
    // the callback, manifest assembly) happens BEFORE the lock is taken —
    // a throw while holding the lock would wedge the whole table
    val allDirs = dirs(prev)
    val inherited = prev.map(_.stats).getOrElse(Map.empty)
    val statsByDir: Map[String, Map[String, ColStat]] =
      allDirs.map { d =>
        d -> (if (d == allDirs.last && newStats.nonEmpty) newStats
              else inherited.getOrElse(d, Map.empty))
      }.filter(_._2.nonEmpty).toMap
    val body = new StringBuilder()
      .append(Magic).append('\n')
      .append(s"version=$next\n")
      .append(s"action=$action\n")
      // URL-encoded: a backticked column name may legally contain a newline,
      // which would otherwise corrupt the line-oriented manifest
      .append(s"schema=${enc(schemaDdl)}\n")
    allDirs.foreach(d => body.append(s"dir=$d\n"))
    // transaction tokens survive every commit (any action, any writer):
    // an exactly-once sink's dedup lookup is O(1) on the latest manifest.
    // Sorted for a deterministic body; writer uniqueness for the
    // object-store self-win check still comes from the fresh dir UUIDs.
    val txns = prev.map(_.txns).getOrElse(Map.empty) ++ txn
    txns.toSeq.sortBy(_._1).foreach { case (sid, b) =>
      body.append(s"txn=${enc(sid)}|$b\n")
    }
    for ((d, cols) <- statsByDir; (c, st) <- cols) {
      val mn = st.min.map(enc).getOrElse(NullMark)
      val mx = st.max.map(enc).getOrElse(NullMark)
      body.append(s"dirstat=$d|${enc(c)}|$mn|$mx|${st.hasNull}\n")
    }
    val bodyBytes = body.toString.getBytes(UTF_8)
    if (!log.publishIfAbsent(next, bodyBytes)) {
      // lost the race (or, on the Hadoop store, a reserved-but-never-
      // published lock is in the way); the retry loop re-lands here
      // until retries exhaust
      return None
    }
    // warm the cache with the EXACT published bytes: the committer's own
    // follow-up reads (a streaming sink's replay token check, the next
    // merge's input) then cost zero GETs
    if (manifestCache.size >= ManifestCacheMax) manifestCache.clear()
    manifestCache.put(next, parseManifest(next, bodyBytes))
    advanceSeen(next) // the committer KNOWS the new latest — no probe needed
    // periodic checkpoint hint (best-effort, never fails the commit): cold
    // handles start their probe here instead of LISTing the whole _log
    if (checkpointInterval > 0 && next > 0 && next % checkpointInterval == 0)
      writeCheckpointHint(next, bodyBytes)
    Some(next)
  }

  /** Writes the advisory checkpoint (version + its manifest body). A store
    * without an overwrite primitive disables checkpointing silently; any
    * other failure only costs future cold starts their LIST, so it logs
    * and moves on — the commit it rides on has already succeeded.
    */
  private def writeCheckpointHint(v: Long, manifestBody: Array[Byte]): Unit =
    try {
      val body = new StringBuilder()
        .append(CkptMagic).append('\n')
        .append(s"version=$v\n")
        .append(s"manifest=${enc(new String(manifestBody, UTF_8))}\n")
        .toString.getBytes(UTF_8)
      log.writeCheckpoint(body)
    } catch {
      case _: UnsupportedOperationException => () // store has no checkpoint support
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"ManifestTable $rootStr: best-effort checkpoint at v$v " +
          s"failed (cold starts keep LISTing until the next one lands): ${e.getMessage}")
    }

  private def failRetries(maxRetries: Int): Nothing = {
    val orphan = latestVersion().getOrElse(-1L) + 1
    throw new java.io.IOException(
      s"ManifestTable $rootStr: commit failed after $maxRetries retries; " +
      log.contentionHint(orphan))
  }

  /** Published manifests are IMMUTABLE (the whole commit protocol rests on
    * it: a version is one conditional PUT / exclusive create, never
    * rewritten), so parsed manifests cache safely per table handle. This
    * matters on the object-store path, where one mergeOnce attempt would
    * otherwise GET the same latest manifest three times (token check,
    * merge-input read, commitOnce's own read) per CAS attempt — each a
    * real-latency, billed request. Bounded: a long-lived handle over many
    * versions clears rather than grows.
    */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Manifest]()
  private val ManifestCacheMax = 64

  private def readManifest(v: Long): Manifest = {
    val hit = manifestCache.get(v)
    if (hit != null) return hit
    val m = readManifestUncached(v)
    if (manifestCache.size >= ManifestCacheMax) manifestCache.clear()
    manifestCache.put(v, m)
    m
  }

  private def readManifestUncached(v: Long): Manifest = {
    val bytes = log.read(v).getOrElse {
      // a miss AT OR BELOW the handle's lower bound means the append-only
      // _log contract was violated externally (root deleted + recreated
      // while this handle lived): reset the bound and the cache so the
      // next resolve LISTs the NEW log instead of serving phantom
      // versions forever (snapshot() retries once on exactly this signal)
      if (v <= latestSeen) { latestSeen = -1L; manifestCache.clear() }
      throw new java.io.FileNotFoundException(
        s"ManifestTable $rootStr: no manifest for version $v")
    }
    parseManifest(v, bytes)
  }

  /** ADMIN-ONLY unblock for the Hadoop store's documented orphan-lock
    * failure mode: a writer PROCESS that died between reserving `vN.lock`
    * and publishing `vN.txt` wedges all later writers (they exhaust
    * retries naming the lock). This removes the orphan with a fencing
    * check — it REFUSES when version `version`'s manifest is published
    * (the writer actually committed; the diagnosis is wrong). The caller
    * asserts no writer is live: breaking a LIVE writer's reservation
    * mid-publish can lose its commit (POSIX rename overwrites). The
    * conditional-PUT store has no locks and throws
    * `UnsupportedOperationException`.
    */
  def breakOrphanLock(version: Long): Unit = log.breakLock(version)

  private def parseManifest(v: Long, bytes: Array[Byte]): Manifest = {
    val text = new String(bytes, UTF_8)
    val lines = text.split('\n')
    require(lines.headOption.contains(Magic),
      s"ManifestTable $rootStr: v$v is not a graft manifest")
    def field(k: String): String = lines.collectFirst {
      case l if l.startsWith(s"$k=") => l.substring(k.length + 1)
    }.getOrElse(sys.error(s"ManifestTable $rootStr: v$v missing field '$k'"))
    val stats = lines.toSeq.collect {
      case l if l.startsWith("dirstat=") => l.substring(8).split('|') match {
        case Array(d, c, mn, mx, hn) =>
          (d, dec(c), ColStat(
            if (mn == NullMark) None else Some(dec(mn)),
            if (mx == NullMark) None else Some(dec(mx)),
            hn.toBoolean))
        case other => sys.error(s"ManifestTable $rootStr: v$v bad dirstat line '$l'")
      }
    }.groupBy(_._1).map { case (d, rows) =>
      d -> rows.map(r => r._2 -> r._3).toMap
    }
    val txns = lines.toSeq.collect {
      case l if l.startsWith("txn=") => l.substring(4).split('|') match {
        case Array(sid, b) => dec(sid) -> b.toLong
        case other => sys.error(s"ManifestTable $rootStr: v$v bad txn line '$l'")
      }
    }.toMap
    Manifest(field("version").toLong, field("action"), dec(field("schema")),
      lines.toSeq.collect { case l if l.startsWith("dir=") => l.substring(4) },
      stats, txns)
  }
}

object ManifestTable {
  private val Magic = "graft-manifest-v1"
  private val CkptMagic = "graft-ckpt-v1"
  private val DefaultCheckpointInterval = 10
  private val NullMark = " null"
  private val DefaultRetries = 10
  private val RetrySleepMs = 50L
  private val DefaultVacuumGraceMs = 10 * 60 * 1000L
  // scratch staging dirs (merge/delete single-execution discipline) are
  // written at the START of an operation and READ until its commit — their
  // newest mtime is the write-completion time, so the regular grace only
  // covers the write window, not the consumption window. A 100-TB merge's
  // hull + upsert + rewrite phase can easily outlive 10 minutes; give
  // scratch a day (a crashed operation's leaked scratch still collects,
  // just later).
  private val ScratchPrefix = "scratch-"
  private val ScratchVacuumGraceMs = 24 * 60 * 60 * 1000L

  /** Per-column bounds of one data dir (or of an update batch): string-cast
    * min/max of the NON-NULL values (absent ⇒ no non-null rows) plus
    * whether any null exists — `<=>` key matching makes nulls joinable, so
    * they prune separately from the value range.
    */
  private final case class ColStat(min: Option[String], max: Option[String], hasNull: Boolean)

  private final case class Manifest(
      version: Long, action: String, schemaDdl: String, dirs: Seq[String],
      stats: Map[String, Map[String, ColStat]],
      txns: Map[String, Long] = Map.empty)

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String = URLDecoder.decode(s, "UTF-8")

  /** `statsCols`: columns to record per-dir min/max for at write time —
    * list the MERGE key(s) of the table to enable stats-pruned merges.
    * Stats cost one small aggregation per commit and only numeric-family
    * columns participate (see [[ManifestTable.isPrunableType]]).
    */
  /** `checkpointInterval`: every Nth commit writes the advisory `_ckpt`
    * hint (0 disables). The default keeps cold starts at one read + <N
    * probes on long-lived tables.
    */
  def apply(spark: SparkSession, root: String, statsCols: Seq[String] = Nil,
            checkpointInterval: Int = DefaultCheckpointInterval): ManifestTable = {
    val rootPath = new Path(root)
    new ManifestTable(spark, root, statsCols,
      new HadoopLogStore(
        rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration),
        new Path(rootPath, "_log")), checkpointInterval)
  }

  /** The table with its commit log on an S3-class object store via the
    * conditional-PUT primitive ([[ObjectStoreClient.putIfNoneMatch]]):
    * version N's commit is ONE atomic request, the orphan-lock failure
    * mode does not exist, and the retry/backoff/parent-guard protocol is
    * byte-identical to the filesystem table's (see
    * [[ObjectStoreLogStore]] and SCALE.md's conditional-PUT contract).
    * DATA files still read/write through `root`'s Hadoop filesystem —
    * on a real deployment that is the same store via its Hadoop
    * connector (s3a/gs/abfs), whose data-path semantics (immutable dirs
    * written before the commit attempt) the protocol already assumes;
    * only the log's atomicity needs the native precondition this client
    * provides.
    */
  def onObjectStore(spark: SparkSession, root: String, client: ObjectStoreClient,
                    statsCols: Seq[String] = Nil,
                    checkpointInterval: Int = DefaultCheckpointInterval): ManifestTable =
    new ManifestTable(spark, root, statsCols, new ObjectStoreLogStore(client, root),
      checkpointInterval)
}

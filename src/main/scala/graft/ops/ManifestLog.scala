package graft.ops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}

/** The storage primitive [[ManifestTable]]'s commit protocol actually
  * needs: publish version N's manifest atomically, exactly once across all
  * racing writers. Everything else in the protocol (immutable data dirs,
  * snapshot reads from one pinned manifest, the re-derive-and-retry loop,
  * the parent guard) is store-agnostic and lives in [[ManifestTable]];
  * only THIS seam differs between a real filesystem and an S3-class
  * object store (contract spec'd in SCALE.md "ManifestTable on an object
  * store: the conditional-PUT contract").
  */
trait ManifestLogStore {
  /** Committed versions, ascending. */
  def listVersions(): Seq[Long]

  /** The published manifest body for `v`, or None if `v` was never
    * committed. Readers must never observe a torn body — atomic
    * visibility is part of the publish contract.
    */
  def read(v: Long): Option[Array[Byte]]

  /** Atomically publish version `v`. True = THIS call committed it; false
    * = retryable contention (another writer holds/won `v`) — the caller
    * re-derives from the new latest and retries. Non-contention store
    * failures throw.
    */
  def publishIfAbsent(v: Long, body: Array[Byte]): Boolean

  /** Operator guidance for the exhausted-retries error at version `v` —
    * the failure modes differ by store (orphan lock vs pure contention).
    */
  def contentionHint(v: Long): String
}

/** Real-filesystem log store — the STRICTER protocol, synthesizing the
  * conditional PUT from two primitives because POSIX `rename(2)` silently
  * overwrites an existing destination:
  *
  *  - **CAS via exclusive file creation**: committing version N reserves
  *    `_log/vN.lock` with an atomic create-if-absent (`O_CREAT|O_EXCL` on
  *    local POSIX, atomic namenode create on HDFS). Exactly one writer
  *    per version wins; losers retry.
  *  - **Atomic visibility via tmp + rename**: the lock holder writes the
  *    body to `_log/.tmp-<uuid>` and renames it to `vN.txt`. Readers list
  *    only `v*.txt`, so they see either nothing or the whole manifest.
  *
  * The split primitive is also why the orphan-lock failure mode exists
  * here and ONLY here: a writer that dies between reserving `vN.lock` and
  * publishing `vN.txt` wedges the log until an operator removes the lock
  * ([[contentionHint]] names it). The conditional-PUT store has no such
  * window — reserve and publish are one atomic request.
  */
final class HadoopLogStore(fs: => FileSystem, logDir: Path) extends ManifestLogStore {
  import ManifestLogStore._

  override def listVersions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).iterator
      .map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .toSeq.sorted
  }

  override def read(v: Long): Option[Array[Byte]] = {
    val p = manifestPath(v)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      Some(buf.toByteArray)
    } finally in.close()
  }

  override def publishIfAbsent(v: Long, body: Array[Byte]): Boolean = {
    fs.mkdirs(logDir)
    if (!tryReserve(v)) {
      // a reserved-but-never-published version means a writer died
      // mid-commit (or is slow); the retry loop re-lands here until
      // retries exhaust
      return false
    }
    // holding the lock now: any failure before the manifest publishes MUST
    // release it, or this live writer's transient IO error (disk full,
    // rename refusal) turns into a permanent outage for every writer
    try {
      val tmp = new Path(logDir, s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, /* overwrite = */ false)
      try out.write(body) finally out.close()
      // no contention on the final name — the lock made us the sole writer
      // of this version; the rename is only for atomic reader visibility
      if (!fs.rename(tmp, manifestPath(v))) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"ManifestTable log: rename to ${manifestPath(v)} failed while holding its lock")
      }
      true
    } catch {
      case e: Throwable =>
        try fs.delete(lockPath(v), false)
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
    }
  }

  override def contentionHint(v: Long): String =
    s"if no writer is live, a crashed commit left an orphan lock — remove ${lockPath(v)}"

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
      catch {
        // only LOSING THE RACE is contention; a permissions/quota/IO
        // failure must surface as itself, not as endlessly-retried
        // "contention" ending in a misleading orphan-lock hint. HDFS
        // signals the mid-create window of the race as a lease conflict
        // (AlreadyBeingCreatedException — the other writer's create is
        // registered at the namenode but not yet closed), which is as
        // much "lost the race" as the typed already-exists cases.
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: org.apache.hadoop.hdfs.protocol.AlreadyBeingCreatedException => false
      }
  }

  private def manifestPath(v: Long) = new Path(logDir, f"v$v%020d.txt")
  private def lockPath(v: Long) = new Path(logDir, f"v$v%020d.lock")
}

/** The object-store primitive the conditional-PUT log store builds on —
  * the three requests every S3-class store serves. Implementations wrap
  * the store's SDK; transient service errors (throttling, 5xx) may be
  * thrown as [[ObjectStoreClient.TransientStoreException]] and the log
  * store absorbs them into the existing retry loop.
  */
trait ObjectStoreClient {
  /** Create `key` with `bytes` IF AND ONLY IF the key does not exist —
    * S3 `PutObject` + `If-None-Match: *` (412 ⇒ false), GCS
    * `x-goog-if-generation-match: 0`, Azure Blob `If-None-Match: *`.
    * True = created; false = precondition failed (key exists). The PUT is
    * atomic: the object is invisible until it completes, and the
    * precondition is evaluated server-side against the committed state.
    */
  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean

  def get(key: String): Option[Array[Byte]]

  /** Keys under `prefix` (object stores list lexicographically; order here
    * is unspecified and the caller sorts).
    */
  def list(prefix: String): Seq[String]
}

object ObjectStoreClient {
  /** A retryable service failure (throttle, 5xx, connection reset) — the
    * request MAY or MAY NOT have been applied (the ambiguous-failure case
    * every object-store client has to live with).
    */
  final class TransientStoreException(msg: String) extends java.io.IOException(msg)
}

/** Conditional-PUT log store: version N's commit is ONE atomic request —
  * `putIfNoneMatch` of `vN.txt` itself. The winner's manifest IS the
  * commit; a loser's 412 maps onto the protocol's existing
  * lost-the-race/None path, so `ManifestTable`'s re-derive-and-retry loop,
  * backoff, and parent guard carry over unchanged. Compared to
  * [[HadoopLogStore]], two failure modes DISAPPEAR (spec'd in SCALE.md):
  * the separate lock object (reserve and publish are one request, so a
  * crashed writer either published completely or left nothing — no orphan
  * lock to remove) and tmp+rename (per-key atomic visibility is the
  * store's own guarantee).
  *
  * One failure mode is NEW and handled here: an AMBIGUOUS transient error
  * — the store may have committed the PUT before the response was lost.
  * On any subsequent conflict at the same version, the store re-reads the
  * published body and compares it to its own attempt: manifest bodies are
  * globally unique per writer (each embeds the writer's fresh data-dir
  * UUID), so byte-equality proves THIS writer's earlier request won, and
  * the publish reports success instead of letting the retry loop re-append
  * the same dir on top of its own commit (a silent row duplication).
  * The self-win GET is resolved in-call (bounded retries, then throw):
  * returning false on an unresolved read would hand the caller the same
  * row-duplication hazard through its re-derive path.
  */
final class ObjectStoreLogStore(client: ObjectStoreClient, prefix: String)
    extends ManifestLogStore {
  import ManifestLogStore._

  private val logPrefix = prefix.stripSuffix("/") + "/_log/"
  private def key(v: Long) = f"${logPrefix}v$v%020d.txt"

  override def listVersions(): Seq[Long] =
    client.list(logPrefix).iterator
      .map(_.stripPrefix(logPrefix))
      .collect { case ManifestName(v) => v.toLong }
      .toSeq.sorted

  override def read(v: Long): Option[Array[Byte]] = client.get(key(v))

  override def publishIfAbsent(v: Long, body: Array[Byte]): Boolean = {
    try {
      if (client.putIfNoneMatch(key(v), body)) return true
    } catch {
      case _: ObjectStoreClient.TransientStoreException =>
        // ambiguous: the PUT may have landed. Fall through to the
        // self-win check; if the key is still absent the caller's retry
        // loop re-attempts this same version after backoff.
    }
    // 412 or ambiguous failure: did WE win earlier? (see class doc)
    // The self-win GET can itself be throttled — and "false" from this
    // method means PROVEN lost: the caller re-derives from the NEW latest,
    // so a false returned while our ambiguous PUT in fact landed would
    // re-append the same dir on top of our own commit (silent row
    // duplication — the exact hazard the self-win check exists to close).
    // The ambiguity therefore must be resolved HERE: bounded GET retries
    // with backoff, then fail loudly as a store error, never "lost".
    var attempt = 0
    while (attempt < SelfWinGetRetries) {
      try {
        return client.get(key(v)).exists(java.util.Arrays.equals(_, body))
      } catch {
        case e: ObjectStoreClient.TransientStoreException =>
          attempt += 1
          if (attempt >= SelfWinGetRetries) throw e
          Thread.sleep(math.min(25L << attempt, 400L))
      }
    }
    throw new IllegalStateException("unreachable: self-win retry loop")
  }

  /** GET retries resolving the self-win check before the commit aborts. */
  private val SelfWinGetRetries = 6

  override def contentionHint(v: Long): String =
    "conditional-PUT log has no orphan-lock mode — persistent contention means " +
      "live writers keep winning this version; raise maxRetries or shard writers"
}

object ManifestLogStore {
  private[ops] val ManifestName = """v(\d{20})\.txt""".r
}

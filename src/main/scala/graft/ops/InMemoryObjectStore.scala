package graft.ops

import scala.jdk.CollectionConverters._

/** In-memory [[ObjectStoreClient]] with S3-class semantics — the reference
  * implementation of the conditional-PUT primitive (the role Derby plays
  * for the JDBC sink keys: a real in-process backend the driver gate and
  * specs run against; a cloud deployment swaps in an SDK-backed client):
  * per-key atomic conditional PUT (`If-None-Match: *` ⇒ putIfAbsent),
  * strong read-after-write consistency, no rename, no locks. A
  * failure-injection hook models the two transient-error shapes a real
  * store exhibits on the SAME request:
  *
  *  - `FailBeforeCommit` — throttle/5xx rejected the PUT; nothing landed.
  *  - `FailAfterCommit`  — the store committed the PUT but the RESPONSE
  *    was lost (the ambiguous failure every object-store client must
  *    tolerate; see [[ObjectStoreLogStore]]'s self-win check).
  *
  * Two REAL-STORE SEMANTICS knobs let the same contract suite certify
  * client code under the behaviors an SDK-backed store adds on top:
  *
  *  - `listPageSize`: listing is paginated — each page is one billable
  *    request (charged against the throttle window below), and the
  *    combined result is returned in page-SCRAMBLED order so a caller
  *    that silently relies on lexicographic listing fails here, not on
  *    the first store whose pagination interleaves.
  *  - `throttleEvery`: burst-throttling windows — every Nth request
  *    across ALL operation types is rejected with a transient error
  *    BEFORE any state change (the 503-burst shape). Retry loops must
  *    absorb these without protocol drift.
  */
final class InMemoryObjectStore(listPageSize: Int = Int.MaxValue,
                                throttleEvery: Int = 0) extends ObjectStoreClient {
  import InMemoryObjectStore._
  require(listPageSize >= 1 && throttleEvery >= 0)

  private val requestCount = new java.util.concurrent.atomic.AtomicInteger()
  private def maybeThrottle(what: String): Unit =
    if (throttleEvery > 0 && requestCount.incrementAndGet() % throttleEvery == 0)
      throw new ObjectStoreClient.TransientStoreException(
        s"injected burst throttle: $what")

  private val objects = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** (key, 1-based attempt number for that key) => fault to inject. */
  @volatile var putFault: (String, Int) => Fault = (_, _) => Ok

  /** (key, 1-based GET attempt number for that key) => fault; any non-Ok
    * fault throws a transient error BEFORE the read (a throttled/5xx GET —
    * the shape the self-win check must absorb as contention).
    */
  @volatile var getFault: (String, Int) => Fault = (_, _) => Ok

  private val getAttemptsByKey = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Total conditional-PUT attempts observed (all keys). */
  def putAttempts: Int = attempts.values().asScala.map(_.intValue).sum

  /** Total GET requests observed (all keys) — lets specs pin request
    * economy (e.g. the manifest cache's one-GET-per-version contract).
    */
  def getAttempts: Int = getAttemptsByKey.values().asScala.map(_.intValue).sum

  private val absorbedPageThrottleCount = new java.util.concurrent.atomic.AtomicInteger()

  /** Mid-pagination throttles absorbed by the modeled SDK page-retry —
    * observable fault pressure the contract suite can assert on (a
    * swallowed throttle previously left no trace and charged no request).
    */
  def absorbedPageThrottles: Int = absorbedPageThrottleCount.get()

  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    maybeThrottle(s"put $key")
    val n = attempts.merge(key, 1, (a, b) => a + b)
    putFault(key, n) match {
      case Ok =>
        objects.putIfAbsent(key, bytes.clone()) == null
      case FailBeforeCommit =>
        throw new ObjectStoreClient.TransientStoreException(
          s"injected 503 before commit: $key attempt $n")
      case FailAfterCommit =>
        objects.putIfAbsent(key, bytes.clone())
        throw new ObjectStoreClient.TransientStoreException(
          s"injected lost response after commit: $key attempt $n")
    }
  }

  /** Unconditional last-writer-wins PUT (the checkpoint-hint primitive):
    * one billable request, body cloned like the conditional path.
    */
  override def put(key: String, bytes: Array[Byte]): Unit = {
    maybeThrottle(s"put-unconditional $key")
    objects.put(key, bytes.clone()); ()
  }

  /** HEAD is its own billed request class (metadata, no body) — counted
    * separately from GETs so request-economy tests can distinguish the
    * probe traffic of the forward-walking latestVersion from data reads.
    */
  val headAttempts = new java.util.concurrent.atomic.AtomicInteger()
  override def head(key: String): Boolean = {
    maybeThrottle(s"head $key")
    headAttempts.incrementAndGet()
    objects.containsKey(key)
  }

  override def get(key: String): Option[Array[Byte]] = {
    maybeThrottle(s"get $key")
    val n = getAttemptsByKey.merge(key, 1, (a, b) => a + b)
    if (getFault(key, n) != Ok)
      throw new ObjectStoreClient.TransientStoreException(
        s"injected throttled GET: $key attempt $n")
    Option(objects.get(key)).map(_.clone())
  }

  override def list(prefix: String): Seq[String] = {
    val matched = objects.keySet().asScala.iterator.filter(_.startsWith(prefix)).toSeq
    if (listPageSize == Int.MaxValue) { maybeThrottle(s"list $prefix"); matched }
    else {
      // paginated: one billable (throttle-countable) request per page. A
      // throttle on the FIRST page rejects the whole call (the caller's
      // idempotent whole-listing retry is the tested path); a throttle
      // mid-pagination is modeled as absorbed by the SDK wrapper's
      // continuation-token PAGE retry — every real SDK retries the page,
      // not the listing, and without that a ≥(throttleEvery)-page listing
      // would deterministically fail EVERY whole-listing attempt (each
      // attempt's page window always contains a throttle slot). Each
      // absorbed throttle is counted ([[absorbedPageThrottles]]) and its
      // page RETRY is itself a billable request charged against the same
      // throttle window (so bursty-mode fault pressure is not understated
      // vs a real store); the SDK model gives up after 3 page retries —
      // a retry storm surfaces to the caller instead of looping forever
      // (throttleEvery=1 would otherwise never terminate). Pages come
      // back in reverse order so no caller can lean on lexicographic
      // listing surviving pagination.
      // an EMPTY result is still one billed request (a real store returns
      // one empty page); grouped() on Nil yields zero groups, which would
      // make empty-prefix polls free and unthrottleable — fault pressure a
      // contract test could never apply
      val pages =
        if (matched.isEmpty) Seq(Seq.empty[String])
        else matched.sorted.grouped(listPageSize).toSeq
      pages.indices.foreach { i =>
        var attempt = 0
        var done = false
        while (!done) {
          try { maybeThrottle(s"list $prefix page $i attempt $attempt"); done = true }
          catch {
            case e: ObjectStoreClient.TransientStoreException =>
              if (i == 0 || attempt >= 3) throw e
              absorbedPageThrottleCount.incrementAndGet()
              attempt += 1
          }
        }
      }
      pages.reverse.flatten
    }
  }
}

/** Wraps ANY [[ObjectStoreClient]] with the same per-request fault hooks
  * [[InMemoryObjectStore]] injects natively — so the contract suite's
  * transient-503 / lost-response / throttled-GET scenarios run unchanged
  * against a future SDK-backed client (wrap it, point the hooks at it,
  * run the suite). `FailAfterCommit` forwards the PUT to the inner client
  * FIRST (the commit may land) and then loses the response; if the inner
  * client itself fails the forwarded request, the injected fault
  * degenerates to nothing-landed — exactly the ambiguity the protocol
  * must tolerate either way.
  */
final class FaultInjectingClient(inner: ObjectStoreClient) extends ObjectStoreClient {
  import InMemoryObjectStore._

  @volatile var putFault: (String, Int) => Fault = (_, _) => Ok
  @volatile var getFault: (String, Int) => Fault = (_, _) => Ok

  private val putN = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val getN = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    val n = putN.merge(key, 1, (a, b) => a + b)
    putFault(key, n) match {
      case Ok => inner.putIfNoneMatch(key, bytes)
      case FailBeforeCommit =>
        throw new ObjectStoreClient.TransientStoreException(
          s"injected 503 before commit: $key attempt $n")
      case FailAfterCommit =>
        inner.putIfNoneMatch(key, bytes)
        throw new ObjectStoreClient.TransientStoreException(
          s"injected lost response after commit: $key attempt $n")
    }
  }

  override def get(key: String): Option[Array[Byte]] = {
    val n = getN.merge(key, 1, (a, b) => a + b)
    if (getFault(key, n) != Ok)
      throw new ObjectStoreClient.TransientStoreException(
        s"injected throttled GET: $key attempt $n")
    inner.get(key)
  }

  override def list(prefix: String): Seq[String] = inner.list(prefix)

  override def put(key: String, bytes: Array[Byte]): Unit = inner.put(key, bytes)

  override def head(key: String): Boolean = inner.head(key)
}

object InMemoryObjectStore {
  sealed trait Fault
  case object Ok extends Fault
  case object FailBeforeCommit extends Fault
  case object FailAfterCommit extends Fault
}

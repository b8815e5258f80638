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
  */
final class InMemoryObjectStore extends ObjectStoreClient {
  import InMemoryObjectStore._

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

  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
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

  override def get(key: String): Option[Array[Byte]] = {
    val n = getAttemptsByKey.merge(key, 1, (a, b) => a + b)
    if (getFault(key, n) != Ok)
      throw new ObjectStoreClient.TransientStoreException(
        s"injected throttled GET: $key attempt $n")
    Option(objects.get(key)).map(_.clone())
  }

  override def list(prefix: String): Seq[String] =
    objects.keySet().asScala.iterator.filter(_.startsWith(prefix)).toSeq
}

object InMemoryObjectStore {
  sealed trait Fault
  case object Ok extends Fault
  case object FailBeforeCommit extends Fault
  case object FailAfterCommit extends Fault
}

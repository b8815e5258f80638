package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded inverted-index posting accumulator. */
final case class CappedBuf(n: Long, ids: Seq[Long])

/** `groupBy(shingle).agg(CappedIds(cap))` builds a df-capped inverted index
  * in ONE partial-aggregated shuffle: per-group state is at most `cap + 1`
  * ids by construction (one past the cap proves the group is hot; after
  * that only the exact count advances), so map-side combine bounds both
  * the aggregation buffers and the exchange payload no matter how hot a
  * shingle is — the property that lets a 100-TB corpus build candidate
  * pairs without a window sort or a corpus self-join.
  *
  * Output: (df, ids) where `ids` is the COMPLETE sorted posting list when
  * df ≤ cap, and empty when the group is hot. Sorting at finish makes the
  * result independent of partitioning (the capped prefix itself is
  * partition-dependent, but it is only ever emitted when it is the whole
  * group); ids must be unique per group — the shingle table is per-doc
  * distinct.
  */
final class CappedIds(cap: Int) extends Aggregator[Long, CappedBuf, CappedBuf] {
  require(cap > 0)
  // cap+1 without int overflow (cap = Int.MaxValue is the documented
  // "uncapped" degenerate; a wrapped take(negative) would silently empty
  // every posting list)
  private val lim: Int = math.min(cap.toLong + 1L, Int.MaxValue.toLong).toInt

  override def zero: CappedBuf = CappedBuf(0L, Vector.empty)

  override def reduce(b: CappedBuf, id: Long): CappedBuf =
    CappedBuf(b.n + 1, if (b.ids.length >= lim) b.ids else b.ids :+ id)

  override def merge(x: CappedBuf, y: CappedBuf): CappedBuf =
    CappedBuf(x.n + y.n,
      if (x.ids.length >= lim) x.ids
      else if (y.ids.length >= lim) y.ids
      else (x.ids ++ y.ids).take(lim))

  override def finish(b: CappedBuf): CappedBuf =
    if (b.n <= cap) CappedBuf(b.n, b.ids.sorted) else CappedBuf(b.n, Vector.empty)

  override def bufferEncoder: Encoder[CappedBuf] = ExpressionEncoder[CappedBuf]()
  override def outputEncoder: Encoder[CappedBuf] = ExpressionEncoder[CappedBuf]()
}

object CappedIds {
  /** Column form: `CappedIds(cap)(idCol)` → `struct<n: bigint, ids: array<bigint>>`. */
  def apply(cap: Int): Column => Column = {
    val fn = udaf(new CappedIds(cap), ExpressionEncoder[Long]())
    (id: Column) => fn(id)
  }
}

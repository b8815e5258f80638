package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass vector mean as a typed Aggregator (the §7.3 custom-aggregate
  * surface). Compared to posexplode→groupBy(pos)→avg→re-assemble, this
  * shuffles ONE (sums, count) buffer per group with map-side partial
  * aggregation instead of |rows|·dims scalar rows — the difference between a
  * metadata-sized shuffle and a corpus-sized one at 100 TB.
  */
final case class VecAvgBuf(sums: Array[Double], n: Long)

object VectorAvg extends Aggregator[Array[Float], VecAvgBuf, Seq[Double]] {

  override def zero: VecAvgBuf = VecAvgBuf(Array.emptyDoubleArray, 0L)

  // Buffers grow to the max dimensionality seen (short vectors contribute to
  // their leading dims) so ragged input neither crashes the merge nor makes
  // the result depend on partition order. The accumulator array is MUTATED
  // in place and re-wrapped (ObjectHashAggregate holds typed buffers as
  // deserialized objects between updates): after the first row of a group,
  // reduce allocates nothing but the 2-field wrapper — the round-1 version
  // paid an O(dim) copy plus an O(dim) boxing pass per input row.
  override def reduce(b: VecAvgBuf, a: Array[Float]): VecAvgBuf = {
    if (a == null) b
    else {
      val sums =
        if (b.sums.length >= a.length) b.sums
        else java.util.Arrays.copyOf(b.sums, a.length)
      var i = 0
      while (i < a.length) { sums(i) += a(i); i += 1 }
      VecAvgBuf(sums, b.n + 1)
    }
  }

  override def merge(x: VecAvgBuf, y: VecAvgBuf): VecAvgBuf =
    if (x.n == 0) y
    else if (y.n == 0) x
    else {
      val (big, small) = if (x.sums.length >= y.sums.length) (x.sums, y.sums) else (y.sums, x.sums)
      var i = 0
      while (i < small.length) { big(i) += small(i); i += 1 }
      VecAvgBuf(big, x.n + y.n)
    }

  override def finish(b: VecAvgBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.toSeq.map(_ / b.n)

  override def bufferEncoder: Encoder[VecAvgBuf] = ExpressionEncoder[VecAvgBuf]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column form over an `array<float>` column. */
  def apply(c: Column): Column = fn(c)
  private lazy val fn = udaf(this, ExpressionEncoder[Array[Float]]())
}

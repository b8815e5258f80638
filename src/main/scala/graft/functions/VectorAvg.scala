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
final case class VecAvgBuf(sums: Seq[Double], n: Long)

object VectorAvg extends Aggregator[Seq[Float], VecAvgBuf, Seq[Double]] {

  override def zero: VecAvgBuf = VecAvgBuf(Seq.empty, 0L)

  // buffers grow to the max dimensionality seen (short vectors contribute to
  // their leading dims) so ragged input neither crashes the merge nor makes
  // the result depend on partition order
  override def reduce(b: VecAvgBuf, a: Seq[Float]): VecAvgBuf = {
    if (a == null) b
    else {
      val sums = java.util.Arrays.copyOf(b.sums.toArray, math.max(b.sums.length, a.length))
      var i = 0
      while (i < a.length) { sums(i) += a(i); i += 1 }
      VecAvgBuf(sums.toSeq, b.n + 1)
    }
  }

  override def merge(x: VecAvgBuf, y: VecAvgBuf): VecAvgBuf =
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      val (long, short) = if (x.sums.length >= y.sums.length) (x.sums, y.sums) else (y.sums, x.sums)
      val sums = long.toArray
      var i = 0
      while (i < short.length) { sums(i) += short(i); i += 1 }
      VecAvgBuf(sums.toSeq, x.n + y.n)
    }

  override def finish(b: VecAvgBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecAvgBuf] = ExpressionEncoder[VecAvgBuf]()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column form over an `array<float>` column. */
  def apply(c: Column): Column = fn(c)
  private lazy val fn = udaf(this, ExpressionEncoder[Seq[Float]]())
}

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

  override def reduce(b: VecAvgBuf, a: Seq[Float]): VecAvgBuf = {
    if (a == null) b
    else {
      val sums = if (b.sums.isEmpty) new Array[Double](a.length) else b.sums.toArray
      var i = 0
      val n = math.min(sums.length, a.length)
      while (i < n) { sums(i) += a(i); i += 1 }
      VecAvgBuf(sums.toSeq, b.n + 1)
    }
  }

  override def merge(x: VecAvgBuf, y: VecAvgBuf): VecAvgBuf =
    if (x.sums.isEmpty) y
    else if (y.sums.isEmpty) x
    else {
      val sums = x.sums.toArray
      var i = 0
      while (i < sums.length) { sums(i) += y.sums(i); i += 1 }
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

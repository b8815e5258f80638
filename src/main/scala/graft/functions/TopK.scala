package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: ordering is (sim desc, id asc) — the same total
  * order a `row_number() OVER (ORDER BY sim DESC, id)` window produces, so a
  * bounded top-k aggregation is result-identical to the window formulation.
  */
final case class Scored(sim: Double, id: Long)

/** Bounded top-k accumulator (two-stage top-k).
  *
  * `groupBy(query).agg(TopK(k)(sim, id))` replaces the
  * `row_number().over(Window.partitionBy(query).orderBy(...))` pattern whose
  * shuffle carries EVERY scored row — |Q|·|C| for a brute-force scorer. Here
  * map-side partial aggregation caps each (query, partition) buffer at k
  * entries before the exchange, so the shuffle carries at most
  * |Q|·k·partitions rows: the difference between a quadratic and a
  * metadata-sized exchange at 100-TB corpus scale.
  *
  * The buffer is kept sorted best-first; reduce is an insertion into a ≤k
  * vector, merge is a bounded sorted-merge — both associative and
  * commutative over the strict (sim desc, id asc) total order, so the result
  * is independent of partitioning.
  */
final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  // Spark's double sort order: NaN greater than everything (and equal to
  // itself), -0.0 == 0.0. A plain `>` would leave NaN unordered (never
  // beats, never beaten) and the result partition-dependent; Double.compare
  // gets NaN right but splits ±0.0, so zeros are normalized first.
  @inline private def norm(x: Double): Double = if (x == 0.0) 0.0 else x
  private def beats(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(norm(a.sim), norm(b.sim))
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.length == k && !beats(in, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(in, _)) match { case -1 => buf.length; case n => n }
      (buf.take(i) :+ in) ++ buf.drop(i).take(k - i - 1)
    }

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
    val out = Vector.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && beats(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[Scored]): Seq[Scored] = b

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Column form: `TopK(k)(simCol, idCol)` → `array<struct<sim,id>>` sorted
    * best-first (rank = array position + 1).
    */
  def apply(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), ExpressionEncoder[Scored]())
    (sim: Column, id: Column) => fn(sim, id)
  }
}

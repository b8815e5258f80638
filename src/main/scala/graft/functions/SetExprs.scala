package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Static set kernels over Catalyst ArrayData — see [[VectorKernels]] for
  * the pattern (one static JVM method serving interpreted eval and
  * generated code identically).
  */
object SetKernels {
  /** Intersection size of two SORTED-ascending distinct string arrays via a
    * merge walk — exact, zero allocation, ~100 byte-compares per call on
    * document shingle sets. The built-in `array_intersect` builds a fresh
    * UTF8String hash set per ROW, which measured ~30 µs/row on the dedup
    * verify (12 s of a 15 s query at sf0.1); this walk is the same answer
    * at a fraction of the cost. Inputs MUST be sorted with UTF8String
    * binary order (`array_sort`'s order) and duplicate-free — the verify
    * builds them with array_sort over collect_set / array_distinct.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "null shingle element — a corrupt set must fail, not silently under-count")
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    // the in-walk guard only sees elements the merge VISITS, but
    // array_sort places nulls LAST — exactly where the walk terminates
    // once the shorter side is exhausted — so the corrupt-set case it
    // exists for used to pass silently (under-counting the union-side
    // cardinality the caller derives). Sweep the unvisited tails.
    var t = i
    while (t < na) {
      if (a.isNullAt(t))
        throw new IllegalArgumentException(
          "null shingle element — a corrupt set must fail, not silently under-count")
      t += 1
    }
    t = j
    while (t < nb) {
      if (b.isNullAt(t))
        throw new IllegalArgumentException(
          "null shingle element — a corrupt set must fail, not silently under-count")
      t += 1
    }
    c
  }
}

/** `sortedIntersectCount` as a codegen-friendly expression: the call site
  * stays inside WholeStageCodegen, the kernel is one static method call.
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

object SetOps {
  /** Intersection size of two sorted distinct string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCountExpr(GraftBridge.expr(a), GraftBridge.expr(b)))
}

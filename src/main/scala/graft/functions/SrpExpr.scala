package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Fused SRP bucketing: ALL `numTables · planesPerTable` sign-projection
  * bits in one pass over a plan-time plane matrix.
  *
  * The expression-composition form builds one `DotProductExpr` + `when` per
  * (table, plane) — 160 expression nodes at the 8×20 defaults, each
  * re-reading the vector. Here the matrix is a single flat `double[]`
  * reference object and the kernel is one cache-friendly loop; bit values
  * are identical (same md5-derived ±1 planes, same left-to-right double
  * accumulation), which the spec's equivalence test pins.
  */
object SrpKernel {

  /** Deterministic ±1 hyperplane component for (plane, dim) — md5-derived,
    * reproducible across runs and engines. THE definition shared by the
    * fused kernel and the expression-composition spec form.
    */
  def planeSign(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${plane}_$dim".getBytes("UTF-8"))
    val nib = (hex(0) >> 4) & 0xf
    if ((nib & 1) == 1) 1.0 else -1.0
  }

  /** Flat [table][plane][dim] matrix; plane ids namespaced by table. */
  def planeMatrix(numTables: Int, planesPerTable: Int, dims: Int): Array[Double] = {
    val m = new Array[Double](numTables * planesPerTable * dims)
    var i = 0
    var t = 0
    while (t < numTables) {
      var p = 0
      while (p < planesPerTable) {
        var d = 0
        while (d < dims) { m(i) = planeSign(t * 1000 + p, d); i += 1; d += 1 }
        p += 1
      }
      t += 1
    }
    m
  }

  def buckets(v: ArrayData, planes: Array[Double], numTables: Int,
              planesPerTable: Int, dims: Int, isFloat: Boolean): ArrayData = {
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"vector dimension mismatch: ${v.numElements()} vs $dims")
    val vec = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      // a NULL element would read as 0.0 — fail like VectorKernels does
      if (v.isNullAt(d))
        throw new IllegalArgumentException(
          s"null vector element at index $d — a mis-joined or corrupt embedding must fail, not read as 0.0")
      vec(d) = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
      d += 1
    }
    val out = new Array[Long](numTables)
    var i = 0
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        var s = 0.0
        d = 0
        while (d < dims) { s += vec(d) * planes(i); i += 1; d += 1 }
        if (s >= 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** `srp_buckets(vec)` → `array<long>` of one bucket id per hash table
  * (index = table). Full codegen; the plane matrix rides along as a
  * reference object, materialized once per plan.
  */
case class SrpBucketsExpr(child: Expression, numTables: Int, planesPerTable: Int, dims: Int)
    extends UnaryExpression {
  require(numTables > 0 && planesPerTable > 0 && planesPerTable <= 62 && dims > 0)

  @transient private lazy val planes: Array[Double] =
    SrpKernel.planeMatrix(numTables, planesPerTable, dims)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"expected array<float|double>, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"srp_buckets expects array<float|double>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    SrpKernel.buckets(input.asInstanceOf[ArrayData], planes, numTables, planesPerTable, dims, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srpPlanes", planes, "double[]")
    val f = isFloat
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpKernel.buckets($c, $ref, $numTables, $planesPerTable, $dims, $f)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object SrpOps {
  def srpBuckets(vec: Column, numTables: Int, planesPerTable: Int, dims: Int): Column =
    GraftBridge.column(SrpBucketsExpr(GraftBridge.expr(vec), numTables, planesPerTable, dims))
}

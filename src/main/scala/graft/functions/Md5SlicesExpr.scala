package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 8 disjoint 16-bit slices of md5(s) as ints — definitionally equal to
  * parsing `substring(md5(s), 4k+1, 4)` (hex) for k = 0..7: md5's hex form
  * is the digest bytes in order, two hex chars per byte, so slice k is
  * `(digest[2k] << 8) | digest[2k+1]` (unsigned). For FIXED-WIDTH lowercase
  * hex, lexicographic string order equals numeric order ('0'-'9' < 'a'-'f'
  * in ASCII, digits map monotonically to values), so `min(slice-k string)`
  * over any group equals `min(slice-k int)` — the MinHash aggregation can
  * run over primitive ints (codegen min on an int buffer, no per-row
  * UTF8String allocations) and reconstruct the identical hex strings ONCE
  * per aggregated signature where the band layout needs them.
  *
  * Why a kernel: the md5 builtin materializes a 32-char hex UTF8String per
  * shingle and each of the 8 `substring` slices allocates another — ~10
  * allocations per corpus-scale shingle row ahead of a string min-agg.
  * This expression digests once (thread-local MessageDigest) and emits one
  * primitive int array, staying inside WholeStageCodegen.
  */
object Md5SlicesKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def slices16(s: UTF8String): ArrayData = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    val out = new Array[Int](8)
    var k = 0
    while (k < 8) {
      out(k) = ((digest(2 * k) & 0xff) << 8) | (digest(2 * k + 1) & 0xff)
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** First 60 md5 bits as a nonnegative long — the first 8 digest bytes
    * big-endian, logically shifted right one nibble (= parsing the first
    * 15 hex chars base-16).
    */
  def bits60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** The 4-char lowercase hex image of one 16-bit slice — the exact string
    * `substring(md5(s), 4k+1, 4)` would have produced. Signature-level (one
    * call per aggregated value, never per shingle row).
    */
  def hex4(v: Int): UTF8String = {
    val cs = new Array[Byte](4)
    val hex = "0123456789abcdef"
    cs(0) = hex.charAt((v >>> 12) & 0xf).toByte
    cs(1) = hex.charAt((v >>> 8) & 0xf).toByte
    cs(2) = hex.charAt((v >>> 4) & 0xf).toByte
    cs(3) = hex.charAt(v & 0xf).toByte
    UTF8String.fromBytes(cs)
  }
}

/** `md5Slices16(s)` → `array<int>` of the 8 16-bit md5 slices. */
case class Md5Slices16Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5Slices16 expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5SlicesKernel.slices16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SlicesKernel.slices16($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5Hex4(v)` → the 4-char lowercase hex string of a 16-bit slice value. */
case class Md5Hex4Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5Hex4 expects int, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5SlicesKernel.hex4(input.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SlicesKernel.hex4($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5Bits60(s)` → the first 60 bits of md5(s) as a nonnegative long —
  * definitionally `conv(substring(md5hex, 1, 15), 16, 10)`: the first 15
  * hex chars are the digest's first 7.5 bytes big-endian, i.e. the first
  * 8 bytes logically-shifted right by one nibble. Skips the 32-char hex
  * materialization + substring + string-parse per token that the simhash
  * signature pass otherwise pays.
  */
case class Md5Bits60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5Bits60 expects string, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Md5SlicesKernel.bits60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5SlicesKernel.bits60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SlicesOps {
  def md5Slices16(s: Column): Column =
    GraftBridge.column(Md5Slices16Expr(GraftBridge.expr(s)))
  def md5Hex4(v: Column): Column =
    GraftBridge.column(Md5Hex4Expr(GraftBridge.expr(v)))
  def md5Bits60(s: Column): Column =
    GraftBridge.column(Md5Bits60Expr(GraftBridge.expr(s)))
}

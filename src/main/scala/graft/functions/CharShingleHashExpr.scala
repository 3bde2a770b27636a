package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: character k-gram shingle hashes of a
  * string — the fingerprint tier's inner loop
  * ([[graft.operators.TextStats.shingleHashExpr]]).
  *
  * Replaces `transform(sequence(1, n-k+1), i -> hash60(substr(s, i, k)))`,
  * which allocates a substring per shingle (one per CHARACTER of every
  * document). Here the UTF-8 character start offsets are walked once and
  * each k-char window hashes straight over the input bytes. Output is
  * the identical ordered multiset (no dedup, no reorder), so it is a
  * drop-in for the composed formulation — spec-verified element-wise.
  */
case class CharShingleHashExpr(child: Expression, k: Int, engineXx: Boolean)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_shingle_hash expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    CharShingleHashExpr.compute(s.asInstanceOf[UTF8String], k, engineXx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharShingleHashExpr.compute($c, $k, $engineXx)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashExpr =
    copy(child = newChild)
}

object CharShingleHashExpr {

  def compute(s: UTF8String, k: Int, engineXx: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // start byte offset of each character (UTF-8: chars start at bytes
    // that are not 10xxxxxx continuations), plus a sentinel end
    var nChars = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) nChars += 1; i += 1 }
    val off = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { off(c) = i; c += 1 }
      i += 1
    }
    off(nChars) = n
    val count = math.max(nChars - k + 1, 1)
    val out = new Array[Long](count)
    var w = 0
    while (w < count) {
      val from = if (nChars == 0) 0 else off(w)
      val to = off(math.min(w + k, nChars))
      out(w) =
        if (engineXx)
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
            to - from, 42L) >>> 4
        else Md5Hash60Expr.hashRange(bytes, from, to - from)
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry (input should already be normalized — see
    * [[graft.operators.TextStats.shingleHashExpr]]).
    */
  def shingles(norm: Column, k: Int, engineXx: Boolean): Column =
    GraftBridge.column(
      CharShingleHashExpr(GraftBridge.expression(norm), k, engineXx))
}

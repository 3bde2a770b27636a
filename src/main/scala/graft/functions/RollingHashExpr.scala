package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin–Karp ROLLING polynomial hash over
  * every k-codepoint window of a string — true O(1) per shift, the
  * classic rolling-hash fingerprint (vs the md5 shingle sketch, which
  * pays a full digest per window).
  *
  * hash(w) = Σ cp(w_j) · B^(k-1-j)  mod M  (Horner), with
  * B = [[RollingHashExpr.Base]] = 257 and
  * M = [[RollingHashExpr.Mod]] = 1e9+7 — both small enough that every
  * intermediate fits a 64-bit long, and the whole recurrence is plain
  * integer arithmetic reproducible in any engine: the DuckDB oracle
  * twin expands the SAME polynomial per window with precomputed power
  * literals (O(k) per window there; the oracle only checks values).
  *
  * Windows slide over Unicode CODE POINTS (matching `substr` character
  * semantics in both engines). Strings shorter than k hash their whole
  * codepoint sequence as the single window; the empty string yields the
  * single hash 0.
  */
case class RollingHashExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"window width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    RollingHashExpr.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHashExpr {
  val Base = 257L
  val Mod = 1000000007L

  def compute(s: UTF8String, k: Int): ArrayData = {
    // decode UTF-8 code points once
    val bytes = s.getBytes
    val n = bytes.length
    val cps = new Array[Int](n) // upper bound; cpN counts actual chars
    var cpN = 0
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1
      }
      cps(cpN) = cp; cpN += 1
      i += len
    }
    val w = math.min(k, math.max(cpN, 0))
    val count = math.max(cpN - k + 1, 1)
    val out = new Array[Long](count)
    if (cpN == 0) return UnsafeArrayData.fromPrimitiveArray(out) // [0L]
    // Horner over the first window
    var h = 0L
    i = 0
    while (i < w) { h = (h * Base + cps(i)) % Mod; i += 1 }
    out(0) = h
    // precomputed B^(w-1) mod M for the O(1) roll
    var bk1 = 1L
    i = 1
    while (i < w) { bk1 = bk1 * Base % Mod; i += 1 }
    i = 1
    while (i < count) {
      h = (h - cps(i - 1) * bk1 % Mod + Mod) % Mod
      h = (h * Base + cps(i + w - 1)) % Mod
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-API entry (input should already be normalized). */
  def rollingHashes(norm: Column, k: Int): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(norm), k))
}

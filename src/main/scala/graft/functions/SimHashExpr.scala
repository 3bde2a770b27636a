package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: SimHash majority vote over a token-hash
  * array in ONE pass.
  *
  * Semantics are identical to [[graft.operators.Dedup.simhashFromHashes]]
  * (bit j of the result is set iff at least half the hashes have bit j
  * set; empty input pins to 0), but the composed formulation scans the
  * array once PER BIT (32 `filter()` higher-order passes, each a lambda
  * dispatch per element). Here one loop accumulates all bit counters.
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"bits must be in [1, 60], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHashExpr.compute(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashExpr.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  def compute(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    if (n == 0) return 0L
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < bits) {
        cnt(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2 * cnt(j) >= n) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Column-API entry over a token-hash array column. */
  def simhash(hashes: Column, bits: Int): Column =
    GraftBridge.column(SimHashExpr(GraftBridge.expression(hashes), bits))
}

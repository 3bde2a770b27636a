package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: SQ8 asymmetric L2² — the exact query
  * vector against a scalar-quantized corpus row, reconstruction fused
  * into the distance loop:
  *
  *   Σ_j (q_j − (mins_j + codes_j · spans_j / 255))²
  *
  * left-to-right over dimensions, every term in double — bit-identical
  * to the composed HOF formulation
  * `Pq.l2sqExact(q, Sq.reconstruct(codes, r))` (same association:
  * `(code · span) / 255`, then `min + …`, then `(q − recon)²` folded
  * left) and therefore to the DuckDB oracle.
  *
  * This is the (b) tier of the custom-operator preference order
  * (SURVEY.md §2.11) applied to the IVF-SQ serving hot loop: the HOF
  * chain allocates a reconstructed array and dispatches two interpreted
  * lambdas per element for every (query, candidate) pair, and the
  * candidate count under the derived √n-lists/probe rule grows
  * linearly with the corpus — at the 10× scale-up the interpreted
  * formulation billed q90/q92/q96 the worst serving ratios in the
  * suite. The fused loop runs inside whole-stage codegen: no
  * reconstruction buffer, no lambda dispatch, no boxing.
  *
  * Ranges travel as literal double[] references (the
  * [[graft.operators.Sq.Ranges]] artifact is 2·dim doubles —
  * broadcast-by-construction, same contract as the HOF's `typedLit`).
  * Contract: both arrays must have ≥ dim elements with dim =
  * min(|q|, |codes|) = |ranges|; the IVF-SQ catalog always supplies
  * equal-length dim-64 inputs.
  */
case class SqAdcExpr(left: Expression, right: Expression,
                     mins: Array[Double], spans: Array[Double])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val qOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (qOk && cOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_adc expects (array<float|double>, array<int>), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  private def qIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(math.min(q.numElements(), c.numElements()), mins.length)
    val isF = qIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      val recon = mins(i) + c.getInt(i).toDouble * spans(i) / 255.0
      val d = (if (isF) q.getFloat(i).toDouble else q.getDouble(i)) - recon
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sqAdcMins", mins, "double[]")
    val spansRef = ctx.addReferenceObj("sqAdcSpans", spans, "double[]")
    val qGet = if (qIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val rec = ctx.freshName("rec")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()),
         |  $minsRef.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $rec = $minsRef[$i]
         |    + ((double) $b.getInt($i)) * $spansRef[$i] / 255.0;
         |  double $d = ((double) $a.$qGet($i)) - $rec;
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqAdcExpr =
    copy(left = newLeft, right = newRight)
}

object SqAdcExpr {
  /** Column-API entry: fused SQ8 asymmetric L2² (unrounded — callers
    * apply the round-6 engine-parity discipline, as with the HOF).
    */
  def sqAdc(qvec: Column, codes: Column,
            mins: Seq[Double], spans: Seq[Double]): Column =
    GraftBridge.column(SqAdcExpr(
      GraftBridge.expression(qvec), GraftBridge.expression(codes),
      mins.toArray, spans.toArray))
}

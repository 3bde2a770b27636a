package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: exact squared L2 between two numeric
  * vector columns — both elements cast to double BEFORE subtracting,
  * terms folded left in index order. Bit-identical to the HOF baseline
  * [[graft.operators.Pq.l2sqExact]] (`aggregate(zip_with(...))`),
  * which stays as the portable formulation the parity spec pins this
  * against, and to the DuckDB oracle's `list_reduce` (same
  * association).
  *
  * Hot paths served: the exact re-rank behind every refined index
  * (shortlist·1 distances per query — q79/q84/q92) and the exact side
  * of the recall audits (full-corpus by design — q76/q81/q83/q91/q93/
  * q97), where the interpreted two-lambda HOF chain pays per-element
  * dispatch and boxing that this fused primitive loop does not.
  */
case class L2SqExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq expects two array<float|double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) -
        (if (rf) y.getFloat(i).toDouble else y.getDouble(i))
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left.dataType)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.$lGet($i)) - ((double) $b.$rGet($i));
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqExpr =
    copy(left = newLeft, right = newRight)
}

object L2SqExpr {
  /** Column-API entry: fused exact L2² (unrounded — callers apply the
    * round-6 engine-parity discipline, as with the HOF).
    */
  def l2sqFast(a: Column, b: Column): Column =
    GraftBridge.column(
      L2SqExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}

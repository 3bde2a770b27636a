package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: all `m` PQ subspace code assignments of
  * one vector in a single compiled pass — the n·k hot loop of every
  * index build ([[graft.operators.Pq.encodeCodes]]'s fused form).
  *
  * Semantics are BIT-IDENTICAL to the composed HOF argmin it replaces
  * (`array_min` over `struct(round(l2sq(subvec, cvec), 6), cid)`
  * per subspace): per centroid, (x − y)² accumulates left-to-right
  * over the subspace dimensions in double; the sum rounds to 6
  * decimals through the same BigDecimal-shortest-representation
  * HALF_UP that Spark's `round` applies to doubles; the argmin keeps
  * the strictly smaller distance, so ties resolve to the lowest
  * positional cid — exactly the struct ordering of the HOF and of the
  * DuckDB oracle twins.
  *
  * Why native (SURVEY §2.11 preference (b), the [[SqAdcExpr]] move
  * applied to the encode side): the HOF chain dispatches interpreted
  * lambdas per centroid and allocates a scored-struct array per
  * subspace per row — m·K allocations per vector on the map-side
  * encode that every PQ/IVF/SemDeDup build and every streaming append
  * runs over the full corpus. Here the whole m·K·subDim loop is one
  * compiled method on primitive arrays; codegen emits a single call.
  *
  * `cents(s)` = subspace s's centroids sorted by cid, concatenated
  * into one double[]; K may differ per subspace. A vector shorter
  * than m·subDim yields NULL (the HOF's zip_with-padding would yield
  * null distances — both mean "not encodable"; catalog vectors are
  * always exact-length).
  */
case class PqEncodeExpr(child: Expression, cents: Seq[Array[Double]],
                        subDim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  private def vIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** The compiled hot loop; called from both eval and generated code. */
  def encode(v: ArrayData): ArrayData = {
    val m = cents.length
    if (v.numElements() < m * subDim) return null
    val isF = vIsFloat
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val c = cents(s)
      val k = c.length / subDim
      val base = s * subDim
      var bestCid = 0
      var bestD2 = 0.0
      var cid = 0
      while (cid < k) {
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (isF) v.getFloat(base + j).toDouble else v.getDouble(base + j)
          val d = x - c(cid * subDim + j)
          acc += d * d
          j += 1
        }
        val d2 = PqEncodeExpr.round6(acc)
        if (cid == 0 || d2 < bestD2) { bestCid = cid; bestD2 = d2 }
        cid += 1
      }
      out(s) = bestCid
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.encode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Spark's `round(x, 6)` for doubles: HALF_UP over the shortest
    * decimal representation (BigDecimal.valueOf), the engine-parity
    * rounding every distance in the tier goes through.
    */
  def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column-API entry: element s of the result = subspace s's assigned
    * centroid (positional cid, ascending-cid tie-break).
    */
  def encode(vec: Column, cents: Seq[Array[Double]], subDim: Int): Column =
    GraftBridge.column(
      PqEncodeExpr(GraftBridge.expression(vec), cents, subDim))
}

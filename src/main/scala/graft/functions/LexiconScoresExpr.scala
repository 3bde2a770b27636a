package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: marker-lexicon hit counts of a normalized
  * string against N lexicons in ONE tokenization pass — the language-ID
  * scoring loop ([[graft.operators.TextStats.langScoresFromTokens]]).
  *
  * The composed formulation runs one `filter(toks, array_contains(...))`
  * higher-order pass per language (N array scans × M markers per
  * token). Here every token does one hash-map probe against a
  * mask-valued dictionary (a token may belong to several lexicons), so
  * cost is O(tokens), independent of lexicon count. Token counting is
  * multiplicity-preserving, matching `size(filter(...))` exactly.
  */
case class LexiconScoresExpr(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression {

  require(lexicons.nonEmpty && lexicons.size <= 32,
    "mask-based scoring supports 1..32 lexicons")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lexicon_scores expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    lexicons.zipWithIndex.foreach { case (lex, i) =>
      lex.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** One pass: per whitespace token, one dictionary probe; set bits of
    * the mask increment their lexicon's counter.
    */
  def score(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Long](lexicons.size)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val m = masks.get(UTF8String.fromBytes(bytes, start, i - start))
        if (m != null) {
          var mm = m.intValue()
          while (mm != 0) {
            counts(Integer.numberOfTrailingZeros(mm)) += 1
            mm &= mm - 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override def nullSafeEval(s: Any): Any = score(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexiconScores", this,
      classOf[LexiconScoresExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconScoresExpr =
    copy(child = newChild)
}

object LexiconScoresExpr {
  /** Column-API entry over an already-normalized string column. */
  def scores(norm: Column, lexicons: Seq[Seq[String]]): Column =
    GraftBridge.column(
      LexiconScoresExpr(GraftBridge.expression(norm), lexicons))
}

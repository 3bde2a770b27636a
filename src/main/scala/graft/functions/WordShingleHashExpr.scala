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

/** Native Catalyst expression: DISTINCT word k-gram shingle hashes of an
  * already-[[graft.operators.TextStats.normalize]]d string, in one pass.
  *
  * Replaces `array_distinct(transform(sequence(...), i ->
  * hash60(concat_ws(" ", slice(split(norm, " "), i, k)))))` — which
  * allocates a token array, a slice array, and a concatenated string
  * PER SHINGLE (hundreds per document; the measured majority of the
  * minhash pipeline's cost). Because the normalized form is trimmed and
  * single-spaced, the k-token shingle `concat_ws(" ", toks[i..i+k-1])`
  * is EXACTLY the byte range of the input from token i's start to token
  * i+k-1's end — so each hash runs straight over the input bytes with
  * zero per-shingle allocation.
  *
  * Output is the SORTED distinct hash array: every consumer (minhash
  * array_min, Jaccard intersect sizes, explode equi-join) is
  * order-insensitive set machinery, and the DuckDB oracle twin
  * deduplicates the same shingle set, so sorted order changes no query
  * result. Distinct-by-hash equals distinct-by-string up to 60-bit
  * collisions (~n²·2⁻⁶⁰ per document — negligible).
  *
  * `engineXx` selects the [[graft.operators.TextStats.HashMode]] engine:
  * md5-60 oracle parity (default) or xxhash64 (same bytes, same seed 42
  * as Spark's `xxhash64`, >>> 4 — bit-identical to the built-in
  * composition it replaces).
  */
case class WordShingleHashExpr(child: Expression, k: Int, engineXx: Boolean,
                               distinct: Boolean = true)
    extends UnaryExpression {

  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingle_hash expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WordShingleHashExpr.compute(s.asInstanceOf[UTF8String], k, engineXx, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingleHashExpr.compute($c, $k, $engineXx, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashExpr =
    copy(child = newChild)
}

object WordShingleHashExpr {

  /** One pass: token boundaries → per-window hash over the byte range →
    * sort → unique. 0x20 never occurs inside a UTF-8 multibyte sequence,
    * so byte-level space scanning is character-correct.
    */
  def compute(s: UTF8String, k: Int, engineXx: Boolean,
              distinct: Boolean = true): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token starts (normalized input: no leading/trailing/double spaces,
    // but stay safe on arbitrary input — empty tokens just hash "")
    var nTok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val count = math.max(nTok - k + 1, 1)
    val out = new Array[Long](count)
    var w = 0
    while (w < count) {
      // window w spans tokens w .. min(w+k-1, nTok-1); the short case
      // only arises when count == 1 (fewer than k tokens = whole string)
      val from = starts(w)
      val to = ends(math.min(w + k - 1, nTok - 1))
      out(w) =
        if (engineXx)
          XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
            to - from, 42L) >>> 4
        else Md5Hash60Expr.hashRange(bytes, from, to - from)
      w += 1
    }
    if (!distinct) return UnsafeArrayData.fromPrimitiveArray(out)
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < count) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, uniq))
  }

  /** Column-API entry over an already-normalized string column. */
  def shingles(norm: Column, k: Int, engineXx: Boolean): Column =
    GraftBridge.column(
      WordShingleHashExpr(GraftBridge.expression(norm), k, engineXx))

  /** ORDERED token-hash multiset (k=1 windows, duplicates kept) — the
    * simhash voting input, equal element-wise to
    * `transform(split(norm, " "), t -> hash60(t))`.
    */
  def tokenHashes(norm: Column, engineXx: Boolean): Column =
    GraftBridge.column(WordShingleHashExpr(
      GraftBridge.expression(norm), 1, engineXx, distinct = false))

  /** ORDERED k-gram window hashes (duplicates kept, index = starting
    * token) — the positional form the exact-substring overlap tier
    * keys on ([[graft.operators.Dedup.longestCommonRuns]]).
    */
  def orderedShingles(norm: Column, k: Int, engineXx: Boolean): Column =
    GraftBridge.column(WordShingleHashExpr(
      GraftBridge.expression(norm), k, engineXx, distinct = false))
}

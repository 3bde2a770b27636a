package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the oracle-parity 60-bit md5 hash of a
  * string as ONE long — bit-identical to
  * `conv(substring(md5(cast(s as binary)), 1, 15), 16, 10)` (the first
  * 15 hex nibbles are exactly the top 60 bits of the digest), but
  * computed straight from the digest bytes.
  *
  * Why it exists (the (b) tier of SURVEY.md §2.11): the built-in
  * formulation allocates a 32-char hex string per hash, substrings it,
  * and PARSES it back base-16 — three string allocations around one
  * 16-byte digest. The dedup/fingerprint tier computes hundreds of
  * these per document (q21/q23/q25 are the bench's md5 wall), so the
  * per-hash constant matters at 100 TB. The DuckDB oracle twin
  * (`CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`) is unchanged —
  * same bits out.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5Hash60Expr.hash(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Hash60Expr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60Expr =
    copy(child = newChild)
}

object Md5Hash60Expr {
  // MessageDigest is stateful — one per thread, reset per use
  private val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(bytes) as a non-negative long. */
  def hash(bytes: Array[Byte]): Long = hashRange(bytes, 0, bytes.length)

  /** The raw 16-byte digest — for callers deriving more than one hash
    * value from a single md5 ([[CountMinSketchAgg.hashPair]]).
    */
  def digest(bytes: Array[Byte]): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.update(bytes, 0, bytes.length)
    m.digest()
  }

  /** Same over a byte range — zero-copy slice hashing for shingles. */
  def hashRange(bytes: Array[Byte], off: Int, len: Int): Long = {
    val m = md.get()
    m.reset()
    m.update(bytes, off, len)
    val d = m.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Column-API entry. */
  def hash60(c: Column): Column =
    GraftBridge.column(Md5Hash60Expr(GraftBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native Catalyst expression: "any of these hashes MAYBE in the Bloom
  * filter" — the map-side prefilter of Bloom-based decontamination
  * ([[graft.operators.Dedup.contaminatedIdsBloom]]).
  *
  * The filter is a plain `long[]` bit array (`mBits` bits, power of
  * two) shipped as a codegen reference object — the compact form of an
  * eval-benchmark shingle set that is too large to broadcast raw. Probe
  * scheme is standard double hashing (Kirsch–Mitzenmatcher): for a
  * 60-bit shingle hash `h`,
  *
  *   h1 = h & (mBits-1)
  *   h2 = ((h >>> log2(mBits)) & (mBits-1)) | 1        // odd stride
  *   pos_i = (h1 + i·h2) & (mBits-1),  i ∈ [0, numProbes)
  *
  * an element is a MAYBE-hit iff all `numProbes` bits are set; the
  * expression returns true iff ANY array element is a maybe-hit (early
  * exit on the first). No false negatives by construction — the exact
  * confirm join downstream only ever removes false POSITIVES, so the
  * composed operator is output-identical to the broadcast-set
  * formulation it replaces at scale.
  *
  * Whole-stage codegen: one compiled loop over the primitive hash
  * array, bit tests against the referenced `long[]` — no per-row
  * allocation, no lambda dispatch (the (b) tier of SURVEY.md §2.11's
  * preference order, same rationale as [[SqAdcExpr]]).
  */
case class BloomAnyExpr(child: Expression, bits: Array[Long],
                        mBits: Int, numProbes: Int)
    extends UnaryExpression {

  require(mBits > 0 && (mBits & (mBits - 1)) == 0,
    s"mBits must be a positive power of two, got $mBits")
  require(bits.length == mBits / 64,
    s"bit array length ${bits.length} != mBits/64 = ${mBits / 64}")
  require(numProbes >= 1 && numProbes <= 16,
    s"numProbes must be in [1,16], got $numProbes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_any expects array<bigint>, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType

  private val logM = java.lang.Integer.numberOfTrailingZeros(mBits)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mask = (mBits - 1).toLong
    var e = 0
    while (e < n) {
      val h = arr.getLong(e)
      val h1 = h & mask
      val h2 = ((h >>> logM) & mask) | 1L
      var i = 0
      var all = true
      while (all && i < numProbes) {
        val pos = (h1 + i.toLong * h2) & mask
        if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) all = false
        i += 1
      }
      if (all) return true
      e += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val e = ctx.freshName("e")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      val all = ctx.freshName("all")
      val hit = ctx.freshName("hit")
      val mask = (mBits - 1).toLong
      s"""
         |boolean $hit = false;
         |int $n = $a.numElements();
         |for (int $e = 0; !$hit && $e < $n; $e++) {
         |  long $h = $a.getLong($e);
         |  long $h1 = $h & ${mask}L;
         |  long $h2 = (($h >>> $logM) & ${mask}L) | 1L;
         |  boolean $all = true;
         |  for (int $i = 0; $all && $i < $numProbes; $i++) {
         |    long $pos = ($h1 + (long) $i * $h2) & ${mask}L;
         |    if (($bitsRef[(int) ($pos >>> 6)] & (1L << ($pos & 63L))) == 0L) {
         |      $all = false;
         |    }
         |  }
         |  $hit = $all;
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomAnyExpr =
    copy(child = newChild)
}

object BloomAnyExpr {

  /** Column-API entry: true iff any element of the `array<bigint>`
    * column is a maybe-member of the Bloom filter.
    */
  def bloomAny(hashes: Column, bits: Array[Long], mBits: Int,
               numProbes: Int): Column =
    GraftBridge.column(BloomAnyExpr(
      GraftBridge.expression(hashes), bits, mBits, numProbes))

  /** Local reference model of one-element membership — the spec parity
    * baseline AND the arithmetic contract the relational BUILD side
    * ([[graft.operators.Dedup.contaminatedIdsBloom]]) must reproduce
    * bit-for-bit: a hash inserted through the relational position
    * columns must test true here.
    */
  def containsModel(h: Long, bits: Array[Long], mBits: Int,
                    numProbes: Int): Boolean = {
    val mask = (mBits - 1).toLong
    val logM = java.lang.Integer.numberOfTrailingZeros(mBits)
    val h1 = h & mask
    val h2 = ((h >>> logM) & mask) | 1L
    (0 until numProbes).forall { i =>
      val pos = (h1 + i.toLong * h2) & mask
      (bits((pos >>> 6).toInt) & (1L << (pos & 63L))) != 0L
    }
  }

  /** Local reference insert — used by specs to build expected filters. */
  def insertModel(h: Long, bits: Array[Long], mBits: Int,
                  numProbes: Int): Unit = {
    val mask = (mBits - 1).toLong
    val logM = java.lang.Integer.numberOfTrailingZeros(mBits)
    val h1 = h & mask
    val h2 = ((h >>> logM) & mask) | 1L
    var i = 0
    while (i < numProbes) {
      val pos = (h1 + i.toLong * h2) & mask
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }
}

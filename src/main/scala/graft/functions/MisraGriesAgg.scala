package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATES: a bounded `k`-counter summary
  * whose output array is guaranteed to contain every item with true
  * frequency ≥ N/(k+1) — the sketch half of the classic two-pass exact
  * heavy-hitters plan (MG prefilter → broadcast the ≤ k candidates →
  * exact confirm count of candidates only).
  *
  * Why this shape at 100 TB: an exact `groupBy(token)` over a corpus
  * shuffles the full token stream (the n-gram key space can rival the
  * data in size). Here each partition maintains its own k-counter map
  * (partial aggregation — map-side), and only k-sized summaries cross
  * the wire; the confirm pass shuffles only occurrences of the ≤ k
  * surviving candidates, combined map-side. Counts from the sketch are
  * UNDERestimates (never used as output); the confirm pass supplies
  * exact values, so the final answer is deterministic however the
  * partition-local eviction order varies.
  *
  * Guarantee (mergeable-summaries form, Agarwal et al. 2012): the
  * per-summary decrement total is ≤ N_part/(k+1) and is additive under
  * the subtract-min merge used here, so after any merge tree an item
  * with true frequency > N/(k+1) retains a positive counter — with
  * k ≥ ⌈1/θ⌉, every θ-frequent item is in the candidate array.
  *
  * Null items are skipped; weights ≤ 0 are skipped. Weight-w insertion
  * is one map update (histogram feeds compose the same way as
  * [[WeightedPercentileApprox]]); an insertion past capacity pays an
  * O(k) subtract-min scan — fine for the heavy-hitter regime
  * (k = ⌈1/θ⌉ is a few hundred at any useful θ), and the classic
  * bucket-list refinement is the upgrade path if a caller ever needs
  * k ≫ 10⁴.
  */
case class MisraGriesCandidates(
    child: Expression,
    weight: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesCandidates.Buffer] {

  import MisraGriesCandidates._

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType == StringType && weight.dataType == LongType &&
      kExpr.dataType == IntegerType
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "mg_candidates expects (string, bigint, int), got " +
          s"(${child.dataType.simpleString}, ${weight.dataType.simpleString}, " +
          s"${kExpr.dataType.simpleString})")
    else if (!kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "k must be a constant literal")
    else if (k <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"k must be positive, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, weight, kExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null)
      buffer.add(v.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: Buffer): Any =
    new GenericArrayData(
      buffer.candidates.map(s => UTF8String.fromString(s): Any))

  override def serialize(buffer: Buffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MisraGriesCandidates = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : MisraGriesCandidates = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesCandidates =
    copy(child = newChildren(0), weight = newChildren(1),
      kExpr = newChildren(2))
}

object MisraGriesCandidates {

  /** k-counter MG state. `add` is O(1) amortized: an insert past
    * capacity subtracts the map-wide minimum from every counter
    * (removing ≥ 1 entry), the weighted generalization of the classic
    * decrement step.
    */
  final class Buffer(val k: Int) {
    private val counts = mutable.HashMap.empty[String, Long]

    def add(item: String, w: Long): Unit = if (w > 0) {
      counts.updateWith(item) {
        case Some(c) => Some(c + w)
        case None => Some(w)
      }
      if (counts.size > k) shrink()
    }

    private def shrink(): Unit = while (counts.size > k) {
      val m = counts.valuesIterator.min
      counts.filterInPlace((_, c) => c > m)
      counts.mapValuesInPlace((_, c) => c - m)
    }

    def mergeWith(other: Buffer): Unit = {
      other.counts.foreach { case (item, w) =>
        counts.updateWith(item) {
          case Some(c) => Some(c + w)
          case None => Some(w)
        }
      }
      if (counts.size > k) shrink()
    }

    /** Surviving candidate items, sorted for a deterministic array. */
    def candidates: Array[String] = counts.keysIterator.toArray.sorted

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeInt(counts.size)
      counts.foreach { case (item, c) =>
        val b = item.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val k = in.readInt()
      val n = in.readInt()
      val b = new Buffer(k)
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val arr = new Array[Byte](len)
        in.readFully(arr)
        val c = in.readLong()
        b.add(new String(arr, "UTF-8"), c)
        i += 1
      }
      b
    }
  }

  /** Column API: `mg_candidates(item, weight, k)` → `array<string>`. */
  def mg(item: Column, weight: Column, k: Int): Column =
    GraftBridge.column(MisraGriesCandidates(
      GraftBridge.expression(item.cast("string")),
      GraftBridge.expression(weight.cast("long")),
      Literal(k, IntegerType)).toAggregateExpression())
}

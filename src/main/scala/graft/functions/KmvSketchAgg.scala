package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** K-Minimum-Values (KMV / bottom-k) distinct sketch: the k smallest
  * DISTINCT hash values seen, in signed ascending order. The classic
  * mergeable distinct-count summary (Bar-Yossef et al. 2002; the
  * "theta sketch" family), here over a caller-supplied 64-bit hash
  * column (`xxhash64(key)`).
  *
  * Why this shape at 100 TB: `count(distinct user)` per group is fine
  * (Spark expands it to a two-level aggregate), but AUDIENCE OVERLAP —
  * |A ∩ B| / |A ∪ B| across group pairs — is not: exact set
  * intersection shuffles every raw id once per pair. A KMV sketch is a
  * bounded k-long summary per group that supports union (k smallest of
  * the merged sketches) and intersection (inclusion fraction within the
  * union sketch) WITHOUT revisiting the raw ids: sketches are built in
  * one pass with map-side partial aggregation — only ≤ k·8-byte arrays
  * cross the shuffle — and every pairwise estimate is then array math
  * over the tiny per-group frame.
  *
  * Exactness contract (the oracle hook, same pattern as the Bloom
  * decontaminator's no-false-negative tier): while a group's true
  * distinct count is < k the sketch IS the full distinct hash set, so
  * every estimator below returns the exact answer and the query is
  * DuckDB-checkable; past k it degrades to the (k-1)/θ estimator with
  * relative stderr ≈ 1/√(k−2). Saturated-regime accuracy is spec-pinned
  * in KmvSketchSpec.
  *
  * Null hashes are skipped. Output array is sorted ascending (signed —
  * xxhash64 is uniform over the full signed range, so signed order is
  * as good as unsigned and composes with `array_sort`/`array_union`).
  */
case class KmvSketch(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketch.Buffer] {

  import KmvSketch._

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType != LongType || kExpr.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "kmv_sketch expects (bigint hash, int k), got " +
          s"(${child.dataType.simpleString}, ${kExpr.dataType.simpleString})")
    else if (!kExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "k must be a constant literal")
    else if (k < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"k must be >= 2, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): Buffer = new Buffer(k)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: Buffer): Any =
    new GenericArrayData(buffer.sortedValues.map(v => v: Any))

  override def serialize(buffer: Buffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object KmvSketch {

  /** Bounded bottom-k distinct set: a TreeSet capped at k entries —
    * O(log k) insert, O(1) reject of values above the current k-th min
    * once saturated (the common case on a big stream: acceptance rate
    * decays as k/n).
    */
  final class Buffer(val k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit =
      if (set.size < k) { set.add(v); () }
      else if (v < set.last()) { if (set.add(v)) { set.pollLast(); () } }

    def mergeWith(other: Buffer): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }

    def sortedValues: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeInt(set.size)
      val it = set.iterator()
      while (it.hasNext) out.writeLong(it.next())
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
      while (i < n) { b.add(in.readLong()); i += 1 }
      b
    }
  }
}

/** Column-level KMV algebra. The estimators are plain codegen'd
  * `functions._` compositions over the sketch arrays — no UDFs — so a
  * whole pairwise-overlap panel stays inside WholeStageCodegen once the
  * sketches exist.
  */
object Kmv {

  /** `kmv_sketch(hash, k)` → `array<long>` (≤ k smallest distinct,
    * ascending). `hash` must be a 64-bit hash column, e.g.
    * `xxhash64(key)`.
    */
  def sketch(hash: Column, k: Int): Column =
    GraftBridge.column(KmvSketch(
      GraftBridge.expression(hash),
      Literal(k, IntegerType)).toAggregateExpression())

  private val TwoTo64 = math.pow(2.0, 64)

  /** Distinct-count estimate from a sketch: exact `size` while
    * unsaturated; (k−1)/θ once saturated, θ = the fraction of the
    * signed 64-bit hash space covered by the k-th minimum.
    */
  def estimateDistinct(s: Column, k: Int): Column = {
    val m = element_at(s, k).cast("double")
    val theta = (m - lit(Long.MinValue.toDouble) + lit(1.0)) / lit(TwoTo64)
    when(size(s) < k, size(s).cast("double"))
      .otherwise(lit((k - 1).toDouble) / theta)
  }

  /** The union's own KMV sketch: k smallest of the merged sketches —
    * the closure property that makes bottom-k composable.
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimateDistinct(unionSketch(a, b, k), k)

  /** Intersection estimate: inclusion fraction ρ of the union sketch's
    * values that appear in BOTH input sketches, scaled by the union
    * estimate (the standard KMV/theta intersection). Exact while BOTH
    * input sketches are unsaturated — each is then its set's complete
    * hash list, so `array_intersect` IS the intersection, even when
    * their union reaches k (the estimator is kept only when at least
    * one side has actually dropped values).
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val u = unionSketch(a, b, k)
    val inBoth = size(array_intersect(array_intersect(u, a), b))
    when(size(a) < k && size(b) < k,
        size(array_intersect(a, b)).cast("double"))
      .otherwise(inBoth.cast("double") / size(u) * unionEstimate(a, b, k))
  }

  /** Jaccard estimate |A∩B| / |A∪B| from the two sketches. */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column =
    intersectEstimate(a, b, k) / unionEstimate(a, b, k)
}

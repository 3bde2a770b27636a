package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, QuantileSummaries}
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** WEIGHTED approximate percentile: the Greenwald–Khanna sketch of
  * Spark's `percentile_approx`, generalized to `(value, weight)` input
  * so it can consume a pre-aggregated HISTOGRAM — one sketch update per
  * DISTINCT value instead of one per row.
  *
  * Why this exists (SURVEY §6.1, q94): the per-row sketch re-pays its
  * buffer/compress cycle for every duplicate of a value, while the
  * extents engine's exact path amortizes duplicates through a
  * `groupBy(value)` histogram whose map-side combine collapses them
  * before any shuffle. Real metric columns (rates, counts, flags,
  * quantities) are heavily duplicated, so the histogram is tiny
  * relative to the data. This aggregate lets the APPROXIMATE path ride
  * the same histogram: `groupBy(value).count()` map-combines, then the
  * sketch ingests `(value, cnt)` pairs — weight-w insertion is O(1),
  * not O(w).
  *
  * Mechanics: Spark's own [[QuantileSummaries]] (public API) does the
  * bounded-memory work. A batch of sorted distinct `(value, w)` pairs
  * IS an exact GK summary — `Stats(value, g = w, delta = 0)` — so
  * weighted insertion is: buffer pairs, sort, wrap as a summary,
  * `compress()` to the ε bound, `merge()` into the running summary.
  * Compression and merging keep the standard GK guarantee: rank error
  * ≤ ε·n with ε = 1/accuracy (same contract as `percentile_approx`,
  * default accuracy 10⁴ → ~1e-4 relative rank).
  *
  * Null and NaN values are skipped (the `percentile_approx` contract);
  * weights ≤ 0 are skipped. Output is `array<double>` aligned with the
  * requested percentage array, null when no values survive.
  */
case class WeightedPercentileApprox(
    child: Expression,
    weight: Expression,
    percentagesExpr: Expression,
    accuracyExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[WeightedPercentileApprox.Buffer] {

  import WeightedPercentileApprox._

  def this(child: Expression, weight: Expression,
           percentagesExpr: Expression, accuracyExpr: Expression) =
    this(child, weight, percentagesExpr, accuracyExpr, 0, 0)

  private lazy val accuracy: Int =
    accuracyExpr.eval().asInstanceOf[Number].intValue()

  private lazy val percentages: Array[Double] =
    percentagesExpr.eval().asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = child.dataType == DoubleType &&
      weight.dataType == LongType &&
      (percentagesExpr.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }) && accuracyExpr.dataType == IntegerType
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "weighted_percentile_approx expects (double, bigint, " +
            s"array<double>, int), got (${child.dataType.simpleString}, " +
            s"${weight.dataType.simpleString}, " +
            s"${percentagesExpr.dataType.simpleString}, " +
            s"${accuracyExpr.dataType.simpleString})")
    else if (!percentagesExpr.foldable || !accuracyExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "percentages and accuracy must be constant literals")
    else if (accuracy <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"accuracy must be positive, got $accuracy")
    else if (percentages.exists(p => p < 0.0 || p > 1.0))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("percentages must all be in [0, 1]")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckSuccess
  }

  override def children: Seq[Expression] =
    Seq(child, weight, percentagesExpr, accuracyExpr)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "weighted_percentile_approx"

  override def createAggregationBuffer(): Buffer =
    new Buffer(1.0d / accuracy)

  override def update(buffer: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val d = v.asInstanceOf[Double]
      if (!d.isNaN) buffer.add(d, w.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: Buffer, other: Buffer): Buffer = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: Buffer): Any = {
    buffer.query(percentages.toIndexedSeq) match {
      case Some(qs) => new GenericArrayData(qs.toArray)
      case None => null
    }
  }

  override def serialize(buffer: Buffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): Buffer = Buffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : WeightedPercentileApprox =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : WeightedPercentileApprox =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WeightedPercentileApprox =
    copy(child = newChildren(0), weight = newChildren(1),
      percentagesExpr = newChildren(2), accuracyExpr = newChildren(3))
}

object WeightedPercentileApprox {

  /** Pairs buffered before a sort-and-merge into the GK summary; the
    * batch bound keeps per-buffer transient memory flat however many
    * rows a partition feeds one group.
    */
  private val FlushAt = 50000

  /** Aggregation state: a pending (value, weight) batch + the running
    * compressed [[QuantileSummaries]]. All mutation flushes through
    * exact batch summaries (`Stats(v, g = w, delta = 0)`), so the GK
    * error bound is the standard merge-of-compressed-summaries one.
    */
  final class Buffer(val relativeError: Double) {
    private var summary: QuantileSummaries = empty(relativeError)
    private val pending = ArrayBuffer.empty[(Double, Long)]

    private[WeightedPercentileApprox] def restore(
        s: QuantileSummaries): Unit = summary = s

    def add(v: Double, w: Long): Unit = if (w > 0) {
      pending += ((v, w))
      if (pending.length >= FlushAt) flush()
    }

    private def flush(): Unit = if (pending.nonEmpty) {
      val sorted = pending.sortBy(_._1)
      // combine equal adjacent values (histogram feeds are distinct per
      // group already, but plain weighted streams need not be)
      val stats = ArrayBuffer.empty[Stats]
      var total = 0L
      var i = 0
      while (i < sorted.length) {
        var g = sorted(i)._2
        val v = sorted(i)._1
        while (i + 1 < sorted.length && sorted(i + 1)._1 == v) {
          i += 1; g += sorted(i)._2
        }
        stats += Stats(v, g, 0L)
        total += g
        i += 1
      }
      val batch = new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError,
        stats.toArray, total, true).compress()
      summary =
        if (summary.count == 0) batch
        else summary.compress().merge(batch)
      pending.clear()
    }

    def mergeWith(other: Buffer): Unit = {
      flush(); other.flush()
      if (other.summary.count > 0) {
        summary =
          if (summary.count == 0) other.summary
          else summary.compress().merge(other.summary.compress())
      }
    }

    def query(ps: Seq[Double]): Option[Seq[Double]] = {
      flush()
      if (summary.count == 0) None
      else {
        // Spark's query() derives its rank-walk tolerance from
        // max(g + delta) over the samples — sound for summaries built
        // by unit inserts (g ≤ 2εn by the GK invariant), but a weighted
        // run can legally carry g ≫ 2εn in ONE tuple (all ranks inside
        // a same-value run ARE that value, so big g loses nothing).
        // Re-split heavy runs into cap-bounded chunks of the SAME value
        // before querying: ≤ 1/(2ε) extra tuples total, the tolerance
        // drops back to the percentile_approx bound, and every chunk
        // answer is value-identical to the run it came from.
        val s = summary.compress()
        val cap = math.max(1L, (2 * relativeError * s.count).toLong)
        if (s.sampled.forall(_.g <= cap)) s.query(ps)
        else {
          val split = ArrayBuffer.empty[Stats]
          s.sampled.foreach { st =>
            var rem = st.g
            while (rem > cap) { split += Stats(st.value, cap, st.delta); rem -= cap }
            if (rem > 0) split += Stats(st.value, rem, st.delta)
          }
          new QuantileSummaries(
            QuantileSummaries.defaultCompressThreshold, relativeError,
            split.toArray, s.count, true).query(ps)
        }
      }
    }

    def toBytes: Array[Byte] = {
      flush()
      val s = summary.compress()
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeDouble(relativeError)
      out.writeLong(s.count)
      out.writeInt(s.sampled.length)
      s.sampled.foreach { st =>
        out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Buffer {
    def fromBytes(bytes: Array[Byte]): Buffer = {
      val in = new DataInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val eps = in.readDouble()
      val count = in.readLong()
      val n = in.readInt()
      val stats = Array.fill(n)(
        Stats(in.readDouble(), in.readLong(), in.readLong()))
      val b = new Buffer(eps)
      b.restore(new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, eps, stats, count, true))
      b
    }
  }

  private def empty(eps: Double): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, eps,
      Array.empty[Stats], 0L, true)

  /** Column API: `weighted_percentile_approx(value, weight,
    * percentages, accuracy)` → `array<double>`.
    */
  def wpa(value: Column, weight: Column, percentages: Seq[Double],
          accuracy: Int): Column = {
    import org.apache.spark.sql.catalyst.expressions.CreateArray
    GraftBridge.column(WeightedPercentileApprox(
      GraftBridge.expression(value.cast("double")),
      GraftBridge.expression(weight.cast("long")),
      CreateArray(percentages.map(p => Literal(p, DoubleType))),
      Literal(accuracy, IntegerType)).toAggregateExpression())
  }
}

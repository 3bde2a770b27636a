package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min frequency sketch (Cormode & Muthukrishnan 2005): a d×w
  * grid of counters answering point-frequency queries for EVERY key —
  * `est(x) = min over rows r of cell(r, h_r(x))` — with one-sided error:
  * `exact ≤ est ≤ exact + ε·N` where ε = e/w, w.p. ≥ 1 − e^−d. The
  * complement of [[MisraGriesCandidates]] in the sketch family: MG
  * surfaces WHICH items are frequent (a candidate set, counts unusable),
  * CM answers HOW OFTEN for any asked item (no candidate enumeration).
  * Together with KMV (distinct-count/overlap) and Bloom (membership)
  * this closes the standard mergeable-summaries toolbox.
  *
  * Why this shape at 100 TB: the buffer is a FIXED d·w long array per
  * group — element-wise-additive under merge, so partial aggregation
  * combines map-side and only d·w·8 bytes per group ever cross the
  * shuffle, however many distinct keys stream through (a token stream's
  * key space can rival the corpus in size). Per-shard sketches built
  * independently merge by vector add into the corpus sketch — the
  * anti-entropy property the q145 shard fingerprints use, extended from
  * set-equality to frequency estimation.
  *
  * Hashing is oracle-reproducible Kirsch–Mitzenmacher double hashing
  * from ONE md5 per item (their Theorem: two pairwise-independent hashes
  * h1 + r·h2 preserve the CM/Bloom error bounds across all d rows):
  * h1 = the digest's first 15 hex nibbles as a 60-bit int (the
  * [[Md5Hash60Expr]] value), h2 = nibbles 16–30, and
  * `bucket_r = (h1 + r·step) mod w` with `step = 2·(h2 mod 2^20) + 1`
  * (odd, so rows stay distinct; the 2^20 reduction keeps
  * `h1 + r·step < 2^63` — DuckDB raises on BIGINT overflow, so the
  * oracle twin must stay in range by construction, not by luck). One
  * digest per item vs d independent md5s is the map-side constant that
  * matters when the sketch pass rides the same scan as tokenization.
  *
  * Null items are skipped; weights ≤ 0 are skipped (the
  * [[MisraGriesCandidates]] rules). Output is the flattened row-major
  * cell array (index r·w + b), deterministic under any partitioning —
  * integer vector addition is commutative — so the sketch itself, not
  * just estimates read off it, is hash-checkable against an engine that
  * recomputes it relationally.
  */
case class CountMinSketchAgg(
    child: Expression,
    weight: Expression,
    dExpr: Expression,
    wExpr: Expression,
    xxExpr: Expression = Literal(false,
      org.apache.spark.sql.types.BooleanType),
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMinSketchAgg._

  private lazy val d: Int = dExpr.eval().asInstanceOf[Number].intValue()
  private lazy val w: Int = wExpr.eval().asInstanceOf[Number].intValue()
  private lazy val engineXx: Boolean = xxExpr.eval().asInstanceOf[Boolean]

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = child.dataType == StringType && weight.dataType == LongType &&
      dExpr.dataType == IntegerType && wExpr.dataType == IntegerType &&
      xxExpr.dataType == org.apache.spark.sql.types.BooleanType
    if (!ok)
      TypeCheckResult.TypeCheckFailure(
        "cm_sketch expects (string, bigint, int, int, boolean), got " +
          s"(${child.dataType.simpleString}, ${weight.dataType.simpleString}, " +
          s"${dExpr.dataType.simpleString}, ${wExpr.dataType.simpleString}, " +
          s"${xxExpr.dataType.simpleString})")
    else if (!dExpr.foldable || !wExpr.foldable || !xxExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        "d, w, and the hash mode must be constant literals")
    // a foldable-but-null literal (Literal(null, IntegerType)) must fail
    // analysis here, not NPE when the d/w positivity check below forces
    // the lazy evals — the Column API never builds one, but the
    // expression is registered infrastructure
    else if (dExpr.eval() == null || wExpr.eval() == null ||
        xxExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "d, w, and the hash mode must be non-null literals")
    else if (d <= 0 || w <= 0)
      TypeCheckResult.TypeCheckFailure(s"d and w must be positive, got ($d, $w)")
    else if (d.toLong * w > (1L << 24))
      TypeCheckResult.TypeCheckFailure(
        s"sketch too large: d*w = ${d.toLong * w} cells > 2^24 — the buffer " +
          "is per-group state; size w for the ε = e/w you need, not the key space")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def children: Seq[Expression] =
    Seq(child, weight, dExpr, wExpr, xxExpr)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cm_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(cells: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val wt = weight.eval(input)
    if (v != null && wt != null && wt.asInstanceOf[Long] > 0)
      add(cells, v.asInstanceOf[UTF8String].getBytes, wt.asInstanceOf[Long],
        d, w, engineXx)
    cells
  }

  override def merge(cells: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells.length) { cells(i) += other(i); i += 1 }
    cells
  }

  override def eval(cells: Array[Long]): Any =
    new GenericArrayData(cells.map(c => c: Any))

  override def serialize(cells: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(cells.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < cells.length) { out.writeLong(cells(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val cells = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < cells.length) { cells(i) = in.readLong(); i += 1 }
    cells
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren(0), weight = newChildren(1),
      dExpr = newChildren(2), wExpr = newChildren(3),
      xxExpr = newChildren(4))
}

object CountMinSketchAgg {

  /** Derived Count–Min knobs — see [[cmKnobs]]. */
  final case class CmKnobs(d: Int, w: Int) {
    /** Fixed per-group state: the d·w cell count. */
    def cells: Int = d * w
  }

  /** The scale rule for the sketch, as code instead of hard-coded d/w
    * (the [[graft.operators.Similarity.lshKnobs]] discipline): from the
    * published Cormode–Muthukrishnan guarantees, `est ≤ exact + ε·N`
    * w.p. ≥ 1−δ needs `w = ⌈e/ε⌉` and `d = ⌈ln(1/δ)⌉`. Two refinements:
    *
    *  - the width is CAPPED at ~2× the caller's vocabulary estimate —
    *    past that, expected bucket occupancy is already below one and
    *    extra width buys no accuracy, only state (at deployment the
    *    estimate comes from an ingest-time HLL/KMV distinct count; the
    *    oracle fixtures pass a constant so the knobs stay
    *    engine/oracle-shared literals);
    *  - the width rounds UP to the next prime: the KM double-hash walks
    *    rows by an odd step, and a width sharing factors with the step
    *    pattern would make rows correlated (1021/1091-style primes keep
    *    the d row hashes honestly independent).
    *
    * The d·w ≤ 2^24 analysis-time guard in the aggregate still applies;
    * knobs that exceed it fail at `cm()` construction, not silently.
    */
  def cmKnobs(vocabEstimate: Long, eps: Double, delta: Double): CmKnobs = {
    require(vocabEstimate > 0 && eps > 0 && eps < 1 && delta > 0 && delta < 1,
      s"need vocabEstimate > 0, eps/delta in (0,1); got " +
        s"($vocabEstimate, $eps, $delta)")
    val d = math.max(1, math.ceil(math.log(1.0 / delta)).toInt)
    val target = math.ceil(math.E / eps)
    // the aggregate's own analysis guard is d*w <= 2^24 cells; clamp
    // the width there so an extreme eps/vocab pair derives the largest
    // LEGAL sketch instead of overflowing Int on the way to a rejection
    val stateCap = ((1L << 24) / d).toDouble
    val capped = math.min(math.min(target, stateCap),
      math.max(2.0, 2.0 * vocabEstimate)).toInt
    // prime-snapping direction respects the cap: upward normally, but
    // when the next prime would cross the aggregate's d*w <= 2^24
    // analysis guard, snap DOWN — the derived knobs must always
    // construct
    val up = nextPrime(capped)
    val w = if (d.toLong * up <= (1L << 24)) up else prevPrime(capped)
    CmKnobs(d, w)
  }

  private def isPrime(k: Int): Boolean =
    k >= 2 && (2 to math.sqrt(k.toDouble).toInt).forall(k % _ != 0)

  private def nextPrime(n: Int): Int = {
    var x = math.max(2, n)
    while (!isPrime(x)) x += 1
    x
  }

  private def prevPrime(n: Int): Int = {
    var x = math.max(2, n)
    while (x > 2 && !isPrime(x)) x -= 1
    x
  }

  /** `step` reduction modulus: keeps `h1 + (d−1)·step` well under 2^63
    * (h1 < 2^60, step < 2^21) so the DuckDB oracle's BIGINT arithmetic
    * cannot overflow-raise. 2^20 odd steps per h2 is far more row
    * diversity than any practical d needs.
    */
  val StepMod: Long = 1L << 20

  /** The two 60-bit hash values from one md5 digest: h1 = hex nibbles
    * 1–15 ([[Md5Hash60Expr.hash]]), h2 = nibbles 16–30 (the low nibble
    * of byte 7 followed by bytes 8–14).
    */
  def hashPair(bytes: Array[Byte]): (Long, Long) = {
    val dg = Md5Hash60Expr.digest(bytes)
    val h1 = (((dg(0) & 0xffL) << 56) | ((dg(1) & 0xffL) << 48) |
      ((dg(2) & 0xffL) << 40) | ((dg(3) & 0xffL) << 32) |
      ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
      ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)) >>> 4
    val h2 = ((dg(7) & 0xfL) << 56) | ((dg(8) & 0xffL) << 48) |
      ((dg(9) & 0xffL) << 40) | ((dg(10) & 0xffL) << 32) |
      ((dg(11) & 0xffL) << 24) | ((dg(12) & 0xffL) << 16) |
      ((dg(13) & 0xffL) << 8) | (dg(14) & 0xffL)
    (h1, h2)
  }

  /** Row-r bucket for an item — the single definition both the update
    * path and the test-side parity checks share.
    */
  def bucket(h1: Long, h2: Long, r: Int, w: Int): Int =
    ((h1 + r * (2 * (h2 % StepMod) + 1)) % w).toInt

  /** The EngineXx seeds — the q52/q53 hash-mode split applied to the
    * sketch: at deployment scale the per-token md5 is the measured wall
    * (the 100× inset: q147/q149 are md5-BOUND), and two seeded xxhash64
    * values are one 64-bit mix each. Same KM bucket arithmetic either
    * way; only the (h1, h2) source changes, so the sketch ALGEBRA
    * (mass conservation, mergeability, one-sided error) is mode-free.
    */
  val XxSeed1 = 42L
  val XxSeed2 = 2039L

  /** [[hashPair]]'s deployment-mode twin: two seeded xxhash64 mixes,
    * top bits shifted to the same non-negative 60-bit range.
    */
  def hashPairXx(bytes: Array[Byte]): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.Platform
    val h1 = XXH64.hashUnsafeBytes(
      bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, XxSeed1) >>> 4
    val h2 = XXH64.hashUnsafeBytes(
      bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, XxSeed2) >>> 4
    (h1, h2)
  }

  private def add(cells: Array[Long], bytes: Array[Byte], wt: Long,
                  d: Int, w: Int, engineXx: Boolean): Unit = {
    val (h1, h2) = if (engineXx) hashPairXx(bytes) else hashPair(bytes)
    var r = 0
    while (r < d) {
      cells(r * w + bucket(h1, h2, r, w)) += wt
      r += 1
    }
  }

  /** Column API: `cm(item, weight, d, w)` → `array<bigint>` of d·w
    * row-major cells; `engineXx = true` selects the deployment hash.
    */
  def cm(item: Column, weight: Column, d: Int, w: Int,
         engineXx: Boolean = false): Column =
    GraftBridge.column(CountMinSketchAgg(
      GraftBridge.expression(item.cast("string")),
      GraftBridge.expression(weight.cast("long")),
      Literal(d, IntegerType), Literal(w, IntegerType),
      Literal(engineXx, org.apache.spark.sql.types.BooleanType))
      .toAggregateExpression())

  /** Point-frequency estimate read off a sketch column: min over rows of
    * the item's cell. Built from plain Column math (the probe side is a
    * handful of rows riding a broadcast — the hex round-trip cost the
    * native update path avoids is irrelevant here, and keeping it in
    * `conv(substring(md5(…)))` form makes the oracle twin a literal
    * transcription).
    */
  def estimate(cells: Column, item: Column, d: Int, w: Int,
               engineXx: Boolean = false): Column = {
    import org.apache.spark.sql.functions._
    val (h1, h2) = if (engineXx) {
      def seeded(seed: Long) = GraftBridge.column(
        org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(GraftBridge.expression(item.cast("string"))), seed))
      (shiftrightunsigned(seeded(XxSeed1), 4),
        shiftrightunsigned(seeded(XxSeed2), 4))
    } else {
      val dig = md5(item.cast("binary"))
      (conv(substring(dig, 1, 15), 16, 10).cast("long"),
        conv(substring(dig, 16, 15), 16, 10).cast("long"))
    }
    val step = h2 % StepMod * 2 + 1
    val perRow = (0 until d).map { r =>
      element_at(cells, ((h1 + lit(r.toLong) * step) % w).cast("int") +
        lit(r * w) + 1)
    }
    if (perRow.size == 1) perRow.head else least(perRow: _*)
  }

  /** The DuckDB twin of [[estimate]]'s bucket arithmetic, for oracle SQL
    * assembly: row-r bucket of `item` as a SQL fragment.
    */
  def bucketSql(item: String, r: String, w: Int): String =
    s"(CAST(('0x' || substr(md5($item), 1, 15)) AS BIGINT) + ($r) * " +
      s"(2 * (CAST(('0x' || substr(md5($item), 16, 15)) AS BIGINT) % ${StepMod}) + 1)) % $w"
}

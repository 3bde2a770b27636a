package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for the embedding-similarity tier — the
  * OTHER standard Faiss index family next to PQ ([[Pq]]): each
  * dimension is linearly mapped to an unsigned 8-bit code against a
  * learned per-dimension (min, max) range. 4× smaller than float32 at
  * far better fidelity than PQ's m-byte codes, and — unlike PQ — the
  * "training" is a single min/max aggregation, no Lloyd rounds.
  *
  * Spark-first design notes (100 TB scale):
  *  - LEARNING is one `posexplode` + `groupBy(pos)` min/max — a single
  *    map-side-combined aggregation producing 2·dim doubles. No
  *    sampling needed; exact ranges cost one corpus pass.
  *  - ENCODING is a pure projection (`transform` against literal
  *    min/span arrays) — map-side, streaming-compatible, no join, no
  *    shuffle; the codes column is the persistable index table.
  *  - SEARCH (asymmetric): the exact query against reconstructed
  *    corpus values (`mn + code·span/255`), distance folded left in
  *    double and rounded to 6 — the same engine-parity discipline as
  *    [[Pq.l2sqExact]], so the DuckDB oracle reproduces distances
  *    bit-for-bit from the same integer codes. Queries broadcast;
  *    per-query top-k is a WindowGroupLimit. At 100 TB the same
  *    composition as PQ applies: IVF probe pruning in front, SQ codes
  *    per list (Faiss IVF-SQ8), shortlist re-rank behind.
  *
  * Determinism: codes are `round(((x − mn) / span) · 255)` computed in
  * double with identical association in both engines; values are
  * non-negative so HALF_UP (Spark) and half-away-from-zero (DuckDB)
  * agree. A degenerate dimension (mx == mn) gets span 1, mapping every
  * value to code 0.
  */
object Sq {

  /** Per-dimension quantization ranges: `mins(i)` and `spans(i)` for
    * 0-based dimension i; span is clamped to 1 for degenerate
    * (constant) dimensions so encode never divides by zero.
    */
  final case class Ranges(mins: Seq[Double], spans: Seq[Double]) {
    require(mins.length == spans.length)
    def dim: Int = mins.length
  }

  /** Learn exact per-dimension (min, max) over the corpus — one
    * aggregation, 2·dim doubles to the driver (broadcast-by-
    * construction, the [[Pq.learnCodebooks]] artifact contract with
    * no iteration at all).
    */
  def learnRanges(vectors: DataFrame, vecCol: String): Ranges = {
    val rows = vectors
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect().sortBy(_.getInt(0))
    Ranges(
      rows.toSeq.map(_.getDouble(1)),
      rows.toSeq.map { r =>
        val s = r.getDouble(2) - r.getDouble(1)
        if (s > 0) s else 1.0
      })
  }

  /** `array<int>` SQ8 codes of a vector column — a pure projection
    * against the literal range arrays (the map-side index build).
    */
  def encodeCodes(vecCol: Column, r: Ranges): Column = {
    val mins = typedLit(r.mins)
    val spans = typedLit(r.spans)
    // clamp to the unsigned 8-bit contract (Faiss SQ8 clamps at encode
    // time): batch-path values are in-range by construction, but the
    // streaming path encodes NEW vectors against frozen ranges, where
    // an out-of-range input would otherwise emit codes like -3 or 300
    // and corrupt any uint8-packed persistence of the codes column
    transform(vecCol, (x, i) =>
      least(lit(255), greatest(lit(0),
        round((x.cast("double") - element_at(mins, i + 1))
          / element_at(spans, i + 1) * lit(255.0)).cast("int"))))
  }

  /** Reconstructed (dequantized) vector from a codes column:
    * `mn + code·span/255` per dimension, in double.
    */
  def reconstruct(codesCol: Column, r: Ranges): Column = {
    val mins = typedLit(r.mins)
    val spans = typedLit(r.spans)
    transform(codesCol, (c, i) =>
      element_at(mins, i + 1)
        + c.cast("double") * element_at(spans, i + 1) / lit(255.0))
  }

  /** Fused asymmetric L2² of an exact query column against a codes
    * column — the serving-path distance, computed by the native
    * codegen expression [[graft.functions.SqAdcExpr]] (reconstruction
    * folded into one primitive loop; bit-identical to
    * `Pq.l2sqExact(qvec, reconstruct(codes, r))`, which remains the
    * portable baseline the parity spec pins it against). Unrounded;
    * callers apply the round-6 engine-parity discipline.
    */
  def adcDist(qvec: Column, codesCol: Column, r: Ranges): Column =
    graft.functions.SqAdcExpr.sqAdc(qvec, codesCol, r.mins, r.spans)

  /** Asymmetric top-k: exact queries against the SQ8-quantized corpus.
    * `codes` is the persisted index table (id, codes); `queries` is the
    * small side and broadcasts. Distances are round-6 L2² of the query
    * against the reconstruction, ties broken by id; the query itself is
    * excluded (serving semantics).
    * Emits (qid, rank, id, dist).
    */
  def adcTopK(codes: DataFrame, queries: DataFrame,
              idCol: String, codesCol: String, qId: String, vecCol: String,
              r: Ranges, k: Int, roundTo: Int = 6): DataFrame = {
    val joined = codes
      .join(broadcast(queries.select(col(qId).as("qid"),
        col(vecCol).as("qvec"))), col("qid") =!= col(idCol))
      .withColumn("__d",
        round(adcDist(col("qvec"), col(codesCol), r), roundTo))
    val w = Window.partitionBy("qid").orderBy(col("__d"), col(idCol))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("id"),
        col("__d").as("dist"))
  }
}

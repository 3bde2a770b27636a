package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators mirroring the reference's tile-join semantics.
  *
  * Reference (`/root/reference/build.sh`):
  *  - J1 attribute join: `tile-join -c <decade>.csv <tiles>.mbtiles`
  *    attaches CSV columns to tile features by GEOID
  *    (`build.sh:189,210`);
  *  - J2 `--if-matched`: only features that matched a CSV row keep data →
  *    inner-join semantics (`build.sh:189,210`);
  *  - J3 tileset union-merge: `tile-join a.mbtiles b.mbtiles` merges the
  *    choropleth and bubble layers keyed `(z,x,y)` (`build.sh:214`).
  *
  * Scale notes: the attribute side is a per-geoid wide table (≤ millions
  * of rows, few hundred MB) while the geometry/tile side fans out per
  * zoom level — so the attribute side is the BROADCAST side and the join
  * never shuffles the big side. The layer merge is a full-outer
  * key-aligned join; at 100 TB both sides arrive hash-partitioned by the
  * same key from their upstream groupBys, so AQE plans a zero-exchange
  * sort-merge.
  */
object Joins {

  /** J1+J2: attach attribute columns to the feature side by key.
    * `ifMatched = true` reproduces `--if-matched` (inner); false keeps
    * unmatched features with null attributes (left outer).
    */
  def attributeJoin(features: DataFrame, attrs: DataFrame, key: String,
                    ifMatched: Boolean = true): DataFrame =
    features.join(broadcast(attrs), Seq(key),
      if (ifMatched) "inner" else "left_outer")

  /** J3: merge two layer tables on a shared key, keeping rows present in
    * either layer (full outer), with the key coalesced.
    */
  def layerMerge(a: DataFrame, b: DataFrame, key: Seq[String]): DataFrame =
    a.join(b, key, "full_outer")

  /** Skew-salted equi-join: the big side gets a deterministic salt in
    * [0, factor) derived from `saltBy` (any high-cardinality column —
    * NOT the join key), the small side is replicated once per salt
    * value, and the join runs on (key, salt) so one hot key spreads over
    * `factor` reducers.
    *
    * AQE's skew-join split handles most cases at runtime; explicit
    * salting remains the tool when one key dominates a whole stage
    * (e.g. a null-heavy foreign key at 100 TB). Results are identical to
    * the plain join (asserted in CoreOperatorsSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: String, factor: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(saltBy)), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Banded range join: pairs (l, r) with the same key and
    * `r.ts ∈ [l.ts, l.ts + maxDelta]` (microsecond columns).
    *
    * Catalyst plans a raw inequality join as a broadcast-nested-loop —
    * quadratic per key. Here both sides bucket by `floor(ts / maxDelta)`
    * and the left side fans out to its bucket and the next one (any
    * right ts within delta lands in one of the two), making the join a
    * standard shuffle EQUI-join on (key, bucket) with a residual range
    * filter — linear in matches, the canonical interval-join idiom.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTsUs: String, rightTsUs: String, maxDeltaUs: Long): DataFrame = {
    val lb = left.withColumn("__bucket",
      explode(array(floor(col(leftTsUs) / maxDeltaUs),
        floor(col(leftTsUs) / maxDeltaUs) + 1)))
    val rb = right.withColumn("__bucket", floor(col(rightTsUs) / maxDeltaUs))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(rightTsUs) >= col(leftTsUs) &&
        col(rightTsUs) <= col(leftTsUs) + maxDeltaUs)
      .drop("__bucket")
  }
}

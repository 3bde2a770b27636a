package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the single latest right row
  * with `right.ts <= left.ts` within the same key group.
  *
  * The reference has no as-of join (SURVEY.md §2.5 J5 — absent); this is
  * part of the extension tier for event/time-series processing.
  *
  * Spark-first design: instead of a range join (which Catalyst would plan
  * as a broadcast-nested-loop or an exploding theta join), the two sides
  * are UNIONED and resolved with one window pass:
  *
  *   union → shuffle by key → sort by (ts, side) → running
  *   `last(payload, ignoreNulls)` fills each left row with the most
  *   recent right payload.
  *
  * Cost: ONE shuffle + sort of |L|+|R| rows — the same plan shape as a
  * sort-merge join, with no pair-explosion, so it scales linearly at
  * 100 TB. Right rows sort before left rows on ts ties (side 0 < 1),
  * giving inclusive `<=` semantics.
  */
object AsOfJoin {

  /** @param payload right-side columns carried onto matching left rows
    *                (emitted under the same names; they must not clash
    *                with left column names).
    *
    * The payload travels as ONE struct filled with a single
    * `last(ignoreNulls)` — per-column fills would tear rows when the
    * latest right row holds a null in one payload column (mixing values
    * from different right rows).
    *
    * Determinism: when several right rows share (key, ts), the window
    * order adds the payload struct itself as the final tiebreak, so the
    * GREATEST payload wins — stable across runs and engines (payload
    * fields must therefore be orderable types). Internal working columns
    * are uniquified against the left schema, so `__side`-style user
    * columns can't collide.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   ts: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !leftCols.contains(n)).get
    val sideCol = fresh("__graft_asof_side")
    val payCol = fresh("__graft_asof_payload")
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val lTagged = left.select(
      leftCols.toIndexedSeq.map(col) :+ lit(1).as(sideCol) :+
        lit(null).cast(payloadType).as(payCol): _*)
    val rTagged = right.select(
      Seq(col(key), col(ts), lit(0).as(sideCol)) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as(payCol): _*)
    val unioned = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(sideCol), col(payCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn(payCol,
      last(col(payCol), ignoreNulls = true).over(w))
    filled.filter(col(sideCol) === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        payload.map(c => col(s"$payCol.$c").as(c)): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators.
  *
  * The reference's one genuine ranking semantic is tippecanoe's
  * density-ranked feature dropping (`--drop-densest-as-needed`,
  * `/root/reference/build.sh:124-126,149-152`): per tile, keep the k
  * most important features to fit the size budget. That is a per-group
  * top-k — `row_number` over a partition, filtered.
  *
  * Scale note: per-group top-k via window is one shuffle on the
  * partition keys; for very small k over huge groups, Catalyst rewrites
  * rank-limit windows into a partial top-k (WindowGroupLimit) before the
  * shuffle, so the full sort never materializes.
  */
object Windows {

  /** O4: keep the top-k rows per group by `order` (descending priority
    * first — ties broken by `tieBreak` for determinism).
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Column,
                   tieBreak: Column, k: Int,
                   rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order, tieBreak)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}

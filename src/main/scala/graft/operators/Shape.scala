package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The long→wide pivot at the heart of the reference pipeline.
  *
  * Reference semantics (`/root/reference/scripts/shape-data.js`):
  *  - rename long columns to short codes via a dictionary, dropping
  *    unmapped columns (`shape-data.js:33-43`);
  *  - derive a 2-char year suffix from the `year` column
  *    (`shape-data.js:30` — `year.slice(-2)`);
  *  - default a missing `parent_location` to "United States"
  *    (`shape-data.js:44-47`);
  *  - pivot one row per `(id, year)` into one row per id with
  *    `metric-YY` columns; duplicate `(id, year)` rows resolve
  *    last-in-file-wins per cell (`shape-data.js:96-101`);
  *  - emit sorted by GEOID ascending, plain string compare
  *    (`shape-data.js:54-58,105`).
  *
  * Spark-first design notes (100 TB scale):
  *  - the pivot is ONE hash aggregation (`groupBy(id)` with conditional
  *    `max_by` cells) — a single shuffle on the id key with map-side
  *    partial aggregation; no `Dataset.pivot` double-pass, no second
  *    shuffle for carry columns.
  *  - last-wins is made deterministic with an explicit ordering column
  *    (`max_by(value, ord)`) instead of Spark's order-nondeterministic
  *    `first()`/`last()`.
  *  - the output column set is declared up front (metrics × years), so the
  *    plan's schema is static; the reference's first-row-derived schema
  *    quirk (`shape-data.js:107`) is deliberately NOT replicated
  *    (documented deviation, SURVEY.md §1.4).
  */
object Shape {

  /** P1: dictionary rename; unmapped columns are dropped.
    * `keep` columns pass through unrenamed (e.g. `year`).
    */
  def renameColumns(df: DataFrame, mapping: Seq[(String, String)],
                    keep: Seq[String] = Nil): DataFrame = {
    val present = mapping.filter { case (from, _) => df.columns.contains(from) }
    df.select((keep.map(col) ++ present.map { case (f, t) => col(f).as(t) }): _*)
  }

  /** P9: 4-digit year string -> 2-char suffix (`year.slice(-2)`). */
  def yearSuffix(year: Column): Column = substring(year.cast(StringType), -2, 2)

  /** P6: missing parent_location default (`shape-data.js:44-47`). */
  def defaultParentLocation(pl: Column, default: String): Column =
    coalesce(pl, lit(default))

  /** A1: long→wide pivot in a single hash aggregation.
    *
    * @param long     input with one row per (id, year)
    * @param idCol    group key (GEOID)
    * @param carry    per-id columns emitted unsuffixed (n, pl)
    * @param yearCol  column holding the 2-char year suffix
    * @param metrics  metric columns to spread into `metric-YY`
    * @param years    explicit year-suffix list (static schema)
    * @param ordCol   ordering column for last-wins (file position in the
    *                 reference; any monotone id here)
    */
  def pivotWide(long: DataFrame, idCol: String, carry: Seq[String],
                yearCol: String, metrics: Seq[String], years: Seq[String],
                ordCol: String): DataFrame = {
    val carryAggs: Seq[Column] =
      carry.map(c => max_by(col(c), col(ordCol)).as(c))
    val cellAggs: Seq[Column] = for {
      m <- metrics
      y <- years
    } yield max_by(
      when(col(yearCol) === lit(y), col(m)),
      when(col(yearCol) === lit(y), col(ordCol))
    ).as(s"$m-$y")
    val aggs = carryAggs ++ cellAggs
    long.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(idCol)) // O1: ascending binary string order (= LC_ALL=C)
  }

  /** T6/P3: slice a wide table to one decade's column group
    * (`build.sh:177-188,198-209` — csvcut by field list).
    */
  def decadeSlice(wide: DataFrame, fields: Seq[String]): DataFrame =
    wide.select(fields.map(col): _*)
}

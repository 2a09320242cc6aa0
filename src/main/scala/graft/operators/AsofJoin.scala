package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the most recent right row with
  * `rightTs <= leftTs` per key. Spark has no native ASOF operator; per
  * the custom-operator preference order (SURVEY §7.4 tier (a)) this is
  * COMPOSED from built-ins in the standard scalable formulation:
  *
  *   union the two tagged sides → ONE shuffle on (keys), sort by
  *   (ts, side) with right rows first at equal ts (<= semantics) →
  *   `last(_, ignoreNulls)` running window carries each right row's
  *   values forward to the left rows that follow it → keep left rows.
  *
  * Cost: one hash shuffle + one sort over |L|+|R| — the same shape as a
  * sort-merge join, with no per-key subquery and no range explosion, so
  * it scales exactly like any keyed aggregation. A 100 TB time-series
  * enrichment (trades→quotes, events→sessions) runs as a single pass.
  */
object AsofJoin {

  /** @param rightValueCols right columns carried onto left rows, output
    *                       as `<prefix><name>` (include `rightTs` itself
    *                       to expose the matched timestamp)
    * @return all left columns + the prefixed as-of columns (null when no
    *         right row precedes the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    val asofCols = rightValueCols.map(c => s"$prefix$c")
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++
        rightValueCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn("__is_left", lit(0))
    // right rows sort before left rows at equal ts → rightTs == leftTs matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val carried = asofCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .select((left.columns.map(col) ++ asofCols.map(col)).toIndexedSeq: _*)
  }

  /** Forward as-of join — for every left row, the EARLIEST right row with
    * `rightTs >= leftTs` per key (time-to-next-event enrichment: next
    * click after a purchase, next deploy after an alert). Same
    * union-sort shape as [[asofJoin]], mirrored: left rows sort before
    * right rows at equal ts (>= semantics) and a `first(_, ignoreNulls)`
    * FOLLOWING window pulls each right row's values back onto the left
    * rows that precede it. One shuffle + one sort over |L|+|R|. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValueCols: Seq[String],
                      prefix: String = "next_"): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    val asofCols = rightValueCols.map(c => s"$prefix$c")
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++
        rightValueCols.map(c => col(c).as(s"$prefix$c")): _*)
      .withColumn("__is_left", lit(0))
    // left rows sort before right rows at equal ts → rightTs == leftTs matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val carried = asofCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__is_left") === 1)
      .select((left.columns.map(col) ++ asofCols.map(col)).toIndexedSeq: _*)
  }
}

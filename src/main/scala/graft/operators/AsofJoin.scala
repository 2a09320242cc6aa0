package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Nearest-event join — for every left row, the right row with the
    * SMALLEST |rightTs − leftTs| per key, ties to the EARLIER (backward)
    * side: the bidirectional enrichment (closest quote to a trade,
    * closest click to a purchase) that neither as-of direction alone
    * gives. ONE union-sort pass: both the backward (preceding `last`)
    * and forward (following `first`) carries share the same partitioning
    * AND ordering, so Spark plans one shuffle + one sort with two window
    * passes — no second exchange, no join operator. An equal-ts right
    * row sorts before the left row, so the backward carry claims it at
    * distance 0 and the tie rule keeps it (the forward frame starting at
    * currentRow never needs it).
    *
    * Determinism: with unique (keys, rightTs) right rows the carried
    * values are unique per frame; equal prev/next distances resolve to
    * the backward row by the `<=` rule. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValueCols: Seq[String],
                      prefix: String = "nearest_"): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    // value columns travel under the __bv_ namespace; the ts carries
    // under __bts__/__fts__ and outputs under __bc_/__fc_ — disjoint
    // namespaces, so a value column literally named "ts" cannot collide
    // with the internal timestamp carry (it did under the former __b_ts
    // naming, silently overwriting the value before the carry fold)
    val r2 = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++
        rightValueCols.map(c => col(c).as(s"__bv_$c")): _*)
      .withColumn("__is_left", lit(0))
    val order = Seq(col("__ts").asc, col("__is_left").asc)
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__r_ts", when(col("__is_left") === 0, col("__ts")))
    // forward carries read the SAME __bv_ columns (no duplicated copies
    // through the shuffle/sort — the frame differs, not the input)
    val carried = rightValueCols.foldLeft(
      u.withColumn("__bts__", last(col("__r_ts"), ignoreNulls = true).over(wb))
        .withColumn("__fts__", first(col("__r_ts"), ignoreNulls = true).over(wf))
    ) { (df, c) =>
      df.withColumn(s"__bc_$c", last(col(s"__bv_$c"), ignoreNulls = true).over(wb))
        .withColumn(s"__fc_$c", first(col(s"__bv_$c"), ignoreNulls = true).over(wf))
    }
    // distance needs NUMERIC time: timestamps via unix_micros, dates via
    // epoch days, numeric ts columns compared in double (a long cast
    // would truncate fractional timestamps and pick the wrong side)
    def num(c: Column): Column =
      left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
        case org.apache.spark.sql.types.DateType =>
          datediff(c, lit("1970-01-01").cast("date")).cast("long")
        case _ => c.cast("double")
      }
    val useB = col("__fts__").isNull || (col("__bts__").isNotNull &&
      num(col("__ts")) - num(col("__bts__")) <=
        num(col("__fts__")) - num(col("__ts")))
    val outCols = rightValueCols.map(c =>
      when(useB, col(s"__bc_$c")).otherwise(col(s"__fc_$c")).as(s"$prefix$c"))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ outCols: _*)
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

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

  /** Shared collision guard for the directional joins: internal carry
    * names and prefixed outputs must not shadow caller columns. */
  private def guardNames(left: DataFrame, right: DataFrame,
                         rightValueCols: Seq[String], prefix: String): Unit = {
    for (c <- Seq("__ts", "__is_left", "__rrow__")) {
      require(!left.columns.contains(c),
        s"asof join: left column '$c' collides with an internal name")
      require(!right.columns.contains(c),
        s"asof join: right column '$c' collides with an internal name")
    }
    require(rightValueCols.nonEmpty,
      "asof join: rightValueCols must name at least one carried column")
    require(rightValueCols.distinct == rightValueCols,
      "asof join: duplicate names in rightValueCols")
    for (c <- rightValueCols.map(v => s"$prefix$v"))
      require(!left.columns.contains(c),
        s"asof join: output column '$c' already exists on the left side")
  }

  /** @param rightValueCols right columns carried onto left rows, output
    *                       as `<prefix><name>` (include `rightTs` itself
    *                       to expose the matched timestamp). MUST be
    *                       non-empty (contract since r15): pure
    *                       existence enrichment with an empty carry list
    *                       throws — match on `<prefix><rightTs>` is-null
    *                       instead, carrying the timestamp column.
    * @return all left columns + the prefixed as-of columns (null when no
    *         right row precedes the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    guardNames(left, right, rightValueCols, prefix)
    // ONE struct per right row is the atomic carry unit (the
    // asofJoinNearest discipline): a null value column on the matched
    // row must stay null in the output. Per-column ignoreNulls carries
    // (the previous formulation) cannot tell "null because this slot is
    // a left row" from "null because the matched right row's value is
    // null", and backfilled the latter from a farther row — silently
    // mixing rows. The struct itself is null exactly on left rows, so
    // ignoreNulls still skips those; the TemporalFuzz differential pins
    // the whole-row contract.
    val rowStruct = struct(rightValueCols.map(c => col(c).as(c)): _*)
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r2 = right.select(
        keys.map(col) :+ col(rightTs).as("__ts") :+ rowStruct.as("__rrow__"): _*)
      .withColumn("__is_left", lit(0))
    // right rows sort before left rows at equal ts → rightTs == leftTs matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val carried = u.withColumn("__rrow__",
      last(col("__rrow__"), ignoreNulls = true).over(w))
    val outCols = rightValueCols.map(c =>
      col("__rrow__").getField(c).as(s"$prefix$c"))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ outCols: _*)
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
    * rows are unique per frame; equal prev/next distances resolve to
    * the backward row by the `<=` rule. If the right side can hold
    * DUPLICATE timestamps per key, pass `rightTieCols` (a per-(keys, ts)
    * unique ordering, e.g. the event id) — the duplicates collapse to
    * the tie-minimal row via one map-side-combining `min_by` aggregate
    * BEFORE the union, so the pick is partitioning-invariant. Without
    * tie columns, which duplicate wins is sort-stability-dependent.
    *
    * Null safety: each direction carries ONE struct holding the matched
    * row's ts and ALL value columns, so a null value column on the
    * nearest row stays null in the output — per-column ignoreNulls
    * carries (the previous formulation) would backfill it from a
    * farther row, silently mixing rows. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValueCols: Seq[String],
                      prefix: String = "nearest_",
                      rightTieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    // loud guards for the internal namespace and the output columns —
    // the silent-clobber class that previously bit this operator's value
    // carries (see the __bv_ note in git history) and that StableIds
    // guards against the same way
    val internal = Seq("__ts", "__is_left", "__rrow__", "__brow__", "__frow__")
    for (c <- internal) {
      require(!left.columns.contains(c),
        s"asofJoinNearest: left column '$c' collides with an internal name")
      require(!right.columns.contains(c),
        s"asofJoinNearest: right column '$c' collides with an internal name")
    }
    require(rightValueCols.distinct == rightValueCols,
      "asofJoinNearest: duplicate names in rightValueCols")
    require(!rightValueCols.contains("__rts"),
      "asofJoinNearest: rightValueCols may not use the reserved name '__rts'")
    for (c <- rightValueCols.map(v => s"$prefix$v"))
      require(!left.columns.contains(c),
        s"asofJoinNearest: output column '$c' already exists on the left side")

    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    // one struct per right row = the atomic carry unit: __rts (the
    // matched timestamp) + every value column under its own name
    val rowStruct = struct(
      col(rightTs).as("__rts") +: rightValueCols.map(c => col(c).as(c)): _*)
    val r2 = (if (rightTieCols.isEmpty)
        right.select(
          keys.map(col) :+ col(rightTs).as("__ts") :+ rowStruct.as("__rrow__"): _*)
      else
        // collapse duplicate (keys, ts) right rows to the tie-minimal one;
        // hash aggregate with partial combine — no extra sort, and the
        // subsequent union shuffle is the only exchange the right side
        // pays beyond this aggregation
        right.groupBy(keys.map(col) :+ col(rightTs).as("__ts"): _*)
          .agg(min_by(rowStruct, struct(rightTieCols.map(col): _*)).as("__rrow__"))
      ).withColumn("__is_left", lit(0))
    val order = Seq(col("__ts").asc, col("__is_left").asc)
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // __rrow__ is null exactly for left rows, so the ignoreNulls carries
    // pick whole right rows; both carries share one shuffle + one sort
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val carried = u
      .withColumn("__brow__", last(col("__rrow__"), ignoreNulls = true).over(wb))
      .withColumn("__frow__", first(col("__rrow__"), ignoreNulls = true).over(wf))
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
    val bts = col("__brow__").getField("__rts")
    val fts = col("__frow__").getField("__rts")
    val useB = fts.isNull || (bts.isNotNull &&
      num(col("__ts")) - num(bts) <= num(fts) - num(col("__ts")))
    val outCols = rightValueCols.map(c =>
      when(useB, col("__brow__").getField(c))
        .otherwise(col("__frow__").getField(c)).as(s"$prefix$c"))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ outCols: _*)
  }

  /** Forward as-of join — for every left row, the EARLIEST right row with
    * `rightTs >= leftTs` per key (time-to-next-event enrichment: next
    * click after a purchase, next deploy after an alert). Same
    * union-sort shape as [[asofJoin]], mirrored: left rows sort before
    * right rows at equal ts (>= semantics) and a `first(_, ignoreNulls)`
    * FOLLOWING window pulls each right row's values back onto the left
    * rows that precede it. One shuffle + one sort over |L|+|R|.
    * `rightValueCols` MUST be non-empty, as in [[asofJoin]]. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String,
                      rightValueCols: Seq[String],
                      prefix: String = "next_"): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    guardNames(left, right, rightValueCols, prefix)
    // whole-row struct carry — see the null-safety note in [[asofJoin]]
    val rowStruct = struct(rightValueCols.map(c => col(c).as(c)): _*)
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_left", lit(1))
    val r2 = right.select(
        keys.map(col) :+ col(rightTs).as("__ts") :+ rowStruct.as("__rrow__"): _*)
      .withColumn("__is_left", lit(0))
    // left rows sort before right rows at equal ts → rightTs == leftTs matches
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val carried = u.withColumn("__rrow__",
      first(col("__rrow__"), ignoreNulls = true).over(w))
    val outCols = rightValueCols.map(c =>
      col("__rrow__").getField(c).as(s"$prefix$c"))
    carried.filter(col("__is_left") === 1)
      .select(left.columns.map(col).toIndexedSeq ++ outCols: _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANALYZE-style column profiling — the statistics side-channel a query
  * planner (and a data-quality monitor) reads instead of the data:
  * per-column row/null/distinct counts and min/max, as a frame.
  *
  * The reference delegates this to its warehouse backends; here it is
  * one distributed aggregate over ONE scan: all per-column statistics
  * are computed in a single `agg` (Spark plans the multi-countDistinct
  * via one Expand — still one pass over the input), then the 1-row
  * result is melted to a per-column frame with an in-row explode. At
  * 100 TB the scan is the whole cost, so one pass for every column's
  * stats is the shape that matters; for approximate n_distinct at even
  * lower cost, swap in [[Sketches.hllDistinct]] per column.
  *
  * min/max are cast to string AFTER the typed aggregation (so ordering
  * is native — numeric, not lexicographic) purely to fit one output
  * column. Callers profile stable-rendering types (ints, strings,
  * dates); raw doubles render engine-specifically and belong in typed
  * consumers, not a stringly stats row.
  */
object Profiling {

  /** (column_name, n_rows, n_null, n_distinct, min_value, max_value)
    * for each of `cols` — `n_distinct` excludes nulls (the SQL
    * `count(DISTINCT ...)` convention both engines share). */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = array(cols.map(c => struct(
      lit(c).as("column_name"),
      col("n_rows"),
      (col("n_rows") - col(s"cnt_$c")).as("n_null"),
      col(s"nd_$c").as("n_distinct"),
      col(s"min_$c").as("min_value"),
      col(s"max_$c").as("max_value"))): _*)
    one.select(explode(entries).as("e")).select("e.*")
  }

  /** 2-D skyline (Pareto frontier, both dimensions maximized): rows not
    * dominated by any other row (x' >= x and y' >= y, strict in one).
    * The classic "best trade-offs" DB operator — here: which documents
    * are unbeaten on (length, quality) simultaneously.
    *
    * NOT the quadratic self-join: the sweep formulation — a row is on
    * the skyline iff its y beats the best y among STRICTLY larger x
    * (window over -x ascending, range-bounded to exclude ties) AND ties
    * its x-group's best y. Two windows over one sort order, O(n log n)
    * via Spark's window exchange; equal (x, y) duplicates are mutually
    * non-dominating and both survive. `xCol` must be integral (the
    * strict-greater range frame uses an offset of 1). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val w = Window
    // order by -x ascending: a range frame ending at offset -1 then
    // covers exactly the rows with STRICTLY larger x (ties excluded) —
    // range-desc offset semantics differ across engines, negation is
    // the portable spelling
    val negx = (col(xCol) * -1).cast("long")
    val wEq = w.partitionBy(col(xCol))
    df.withColumn("maxy_gt", max(col(yCol)).over(
        w.orderBy(negx.asc).rangeBetween(Window.unboundedPreceding, -1L)))
      .withColumn("maxy_eq", max(col(yCol)).over(wEq))
      .filter((col("maxy_gt").isNull || col(yCol) > col("maxy_gt")) &&
        col(yCol) === col("maxy_eq"))
      .drop("maxy_gt", "maxy_eq")
  }

  /** Gini coefficient of group concentration — how unequally the rows
    * spread across `groupCol` (0 = perfectly even, →1 = one group owns
    * everything): the corpus-diversity monitor a mixture pipeline reads
    * before domain caps ([[Sampling.capPerGroup]]) are tuned. Computed
    * by the exact rank-sum identity G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n
    * over ascending-sorted group counts — all-integer sums, two float
    * divisions at the end. The rank window runs over the GROUP frame
    * (model-sized), never the rows.
    * Output: one row (n_groups, n_rows, gini). */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    val w = Window
      .orderBy(col("x").asc, col(groupCol).asc)
    df.groupBy(groupCol).agg(count(lit(1)).as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_groups"), sum(col("x")).as("n_rows"),
        sum(col("i") * col("x")).as("sixi"))
      .select(col("n_groups"), col("n_rows"),
        round((lit(2L) * col("sixi")).cast("double") /
          (col("n_groups") * col("n_rows")) -
          (col("n_groups") + 1).cast("double") / col("n_groups"), 6)
          .as("gini"))
  }
}

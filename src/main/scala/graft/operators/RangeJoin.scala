package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join with bin blocking. Spark plans a bare
  * inequality join as BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * and a driver-sized broadcast, which dies at scale. The standard fix
  * (SURVEY §7.4 tier (a): compose built-ins) is to discretize time into
  * fixed bins: each point hashes to one bin, each interval explodes to
  * the bins it overlaps, the join becomes an EQUI-join on the bin id, and
  * the exact `between` predicate filters within the bin.
  *
  * Cost: |points| + Σ interval_span/bin rows through one hash shuffle —
  * linear as long as `binMicros` is on the order of typical interval
  * length (too small → interval explosion; too large → bin collisions).
  */
object RangeJoin {

  /** @param extraCond additional join predicate (e.g. key equality)
    * @return matched (point × interval) rows, point columns first */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointTs: String, startTs: String, endTs: String,
                binMicros: Long = 86400000000L, // 1 day
                extraCond: Option[Column] = None): DataFrame = {
    val p = points.withColumn("__bin", (unix_micros(col(pointTs)) / binMicros).cast("long"))
    val i = intervals
      .withColumn("__bin", explode_outer(sequence(
        (unix_micros(col(startTs)) / binMicros).cast("long"),
        (unix_micros(col(endTs)) / binMicros).cast("long"))))
      .filter(col("__bin").isNotNull) // outer+filter: see SafeExplode
    val cond = p("__bin") === i("__bin") &&
      p(pointTs) >= i(startTs) && p(pointTs) <= i(endTs) &&
      extraCond.getOrElse(lit(true))
    p.join(i, cond)
      .drop("__bin")
  }

  /** Interval-OVERLAP join (both sides are intervals; inclusive
    * `s1 <= e2 && s2 <= e1`) with the same bin discipline: each side
    * explodes to its covered bins, the join is an equi-join on the bin
    * id, and the exact predicate filters within the bin. A pair sharing
    * several bins would match once per shared bin, so the join keeps a
    * pair only in its FIRST shared bin (`max(bin(s1), bin(s2))`) — the
    * standard dedup-free form: no `distinct`, so no second shuffle of
    * the matched pairs.
    *
    * Cost: Σ span/bin exploded rows per side through one hash shuffle —
    * pick `binMicros` on the order of typical interval length, exactly
    * as [[rangeJoin]]. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lStart: String, lEnd: String,
                  rStart: String, rEnd: String,
                  binMicros: Long = 86400000000L, // 1 day
                  extraCond: Option[Column] = None): DataFrame = {
    def bin(c: Column): Column = (unix_micros(c) / binMicros).cast("long")
    val l = left.withColumn("__bin",
        explode_outer(sequence(bin(col(lStart)), bin(col(lEnd)))))
      .filter(col("__bin").isNotNull) // outer+filter: see SafeExplode
    val r = right.withColumn("__bin",
        explode_outer(sequence(bin(col(rStart)), bin(col(rEnd)))))
      .filter(col("__bin").isNotNull)
    val cond = l("__bin") === r("__bin") &&
      l(lStart) <= r(rEnd) && r(rStart) <= l(lEnd) &&
      l("__bin") === greatest(bin(l(lStart)), bin(r(rStart))) &&
      extraCond.getOrElse(lit(true))
    l.join(r, cond)
      .drop(l("__bin")).drop(r("__bin"))
  }
}

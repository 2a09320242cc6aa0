package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense global ids by a TOTAL order — the scalable
  * replacement for the two classic traps: `monotonically_increasing_id`
  * (partition-layout-dependent, not dense, changes on any repartition)
  * and `row_number() OVER (ORDER BY …)` with no partition key (funnels
  * the corpus through ONE partition).
  *
  * Shape (the standard two-pass offset construction, pure DataFrame):
  * range-repartition on the order columns, MATERIALIZED once
  * (`localCheckpoint` — the range partitioner SAMPLES per job, so the
  * counts pass and the id pass must read the same physical boundaries
  * or offsets could disagree with actual partition membership; at a
  * real deployment the materialization is a staging write) →
  * per-partition counts (one partition-count-sized driver collect) →
  * cumulative offsets broadcast back → in-partition `row_number` +
  * offset. Exchanges: the range partition plus one pid-keyed window
  * exchange; no SinglePartition anywhere (plan-asserted in spec).
  *
  * Determinism: ids equal the global rank under `orderCols`, which is
  * partition-boundary-invariant — range sampling may move rows between
  * partitions across runs, but rank(row) never changes as long as
  * `orderCols` is a total order (callers must include a tiebreaker;
  * content-hash + unique id is the standard pair). That makes assigned
  * ids reproducible across runs, engines, and cluster sizes — the
  * property a training-corpus id assignment actually needs. */
object StableIds {

  def assign(df: DataFrame, orderCols: Seq[Column],
             idName: String = "stable_id"): DataFrame = {
    require(orderCols.nonEmpty, "stable ids need at least one order column")
    // loud guard, not silent clobber-and-drop (the AsofJoin internal-
    // carry-collision class): a caller column named __pid would be
    // overwritten and deleted, and ordering on it would become
    // partition-layout-dependent — the exact trap this operator solves
    require(!df.columns.contains("__pid"),
      "input already has a __pid column — rename it before assign()")
    require(!df.columns.contains(idName),
      s"input already has a '$idName' column — pass a different idName")
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // partition-count-sized collect (≤ shuffle partitions, never corpus)
    val counts = parted.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = (0 to maxPid).scanLeft(0L) {
      (acc, pid) => acc + counts.getOrElse(pid, 0L)
    }.dropRight(1)
    val offsetCol = element_at(
      typedLit(offsets), col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    parted
      .withColumn(idName, (row_number().over(w) - 1).cast("long") + offsetCol)
      .drop("__pid")
  }
}

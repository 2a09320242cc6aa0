package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-shard training export — the standard last step of
  * a curation pipeline: a seeded content-hash pseudo-random shuffle of
  * the corpus into exactly `numShards` files with stable names
  * (`<prefix>shard-NNNNN-of-MMMMM.<fmt>`), so a training job can map
  * shard → worker reproducibly and two independent runs of the export
  * produce byte-identical shard membership.
  *
  * Shard assignment is `md5(seed, key) mod numShards` — deterministic,
  * partitioning-invariant, and restart-safe. A global-rank ntile would
  * give exactly-equal shard sizes but needs either a serialized global
  * window or sampled range boundaries (nondeterministic at the seams);
  * hash-mod is what production exports use: equal in expectation with
  * O(sqrt) deviation, and any row's shard is recomputable from the row
  * alone. The first two hex digits (256 values) drive the mod, so any
  * `numShards` dividing 256 is exactly uniform over hash values; each
  * output row also CARRIES its `shard_key`, making row→shard assignment
  * part of any downstream content hash.
  *
  * Rows are placed by one hash repartition on the shard key (each key
  * lands in exactly one task, so the [[DynamicFileSink]] finalize pass
  * renames exactly one committed file per shard to its final name) and
  * sorted within the shard by the same seeded hash — the within-shard
  * order is the seeded global shuffle order, not the input order. */
object ShardExport {

  def write(df: DataFrame, keyCol: String, output: String,
            numShards: Int, seed: String = "graft",
            format: String = "json",
            outputNotify: Option[String] = None): DynamicFileSink.Result = {
    require(numShards > 0 && numShards <= 256,
      s"numShards must be in [1, 256], got $numShards")
    require(256 % numShards == 0,
      s"numShards must divide 256 for an exactly uniform hash mod, got $numShards")
    val h = md5(concat_ws("_", lit(seed), col(keyCol).cast("string")))
    val shard = pmod(conv(substring(h, 1, 2), 16, 10).cast("long"),
      lit(numShards.toLong))
    val keyed = df
      .withColumn("shard_key",
        format_string("shard-%05d-of-%05d", shard, lit(numShards)))
      .withColumn("__h", h)
    val placed = keyed
      .repartition(numShards, col("shard_key"))
      .sortWithinPartitions(col("shard_key"), col("__h"), col(keyCol))
      .drop("__h")
    DynamicFileSink.write(placed, DynamicFileSink.Config(
      output = output, format = format, splitField = Some("shard_key"),
      outputNotify = outputNotify))
  }
}

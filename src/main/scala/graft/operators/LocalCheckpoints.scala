package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic block release for keyed-rounds algorithms that
  * `localCheckpoint` every round (ConnectedComponents, the distributed
  * BPE trainer): `Dataset.unpersist` is a NO-OP for a checkpointed frame
  * — localCheckpoint persists its RDD outside the CacheManager, so the
  * blocks otherwise free only on GC + ContextCleaner. Over many rounds
  * that is unbounded block-manager pressure the code merely believes it
  * released. This helper snapshots `sc.getPersistentRDDs` around the
  * checkpoint and hands back the registered RDDs so a superseded round
  * can be dropped explicitly.
  *
  * NEVER release the blocks of a frame that is still reachable (the
  * final round's output): a localCheckpoint's lineage is truncated, so
  * dropped blocks are unrecoverable — release only rounds that have
  * been fully superseded.
  *
  * Single-algorithm-at-a-time assumption: nothing else persists RDDs
  * between the before/after snapshots — true for the gate/bench/test
  * harnesses, which run queries sequentially. */
private[operators] object LocalCheckpoints {

  def tracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = df.localCheckpoint() // eager: materialized on return
    val added = sc.getPersistentRDDs.view
      .filterKeys(!before.contains(_)).values.toSeq
    (out, added)
  }

  def release(blocks: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    blocks.foreach(_.unpersist(blocking = false))
}

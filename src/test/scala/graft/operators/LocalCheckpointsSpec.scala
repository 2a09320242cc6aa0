package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** LocalCheckpoints must track ONLY the checkpoint's own persisted RDD.
  * The regression this pins: a lazy upstream cache materializes during
  * the first eager checkpoint, and a registry-diff implementation
  * attributed the cache's RDD to the round's blocks — releasing round 1
  * then destroyed the upstream cache (ConnectedComponents recomputed
  * its whole edge pipeline every later round). */
class LocalCheckpointsSpec extends SparkSpec {
  import spark.implicits._

  test("tracked() does not capture a cache that materializes inside the checkpoint") {
    val base = Seq(1, 2, 3).toDF("x").cache() // LAZY: not yet materialized
    val (ck, blocks) = LocalCheckpoints.tracked(base.select((col("x") * 2).as("y")))
    // the checkpoint's own RDD is tracked...
    assert(blocks.nonEmpty)
    // ...and the cache's RDD (materialized during the eager checkpoint)
    // is NOT in the tracked set
    val sc = spark.sparkContext
    val trackedIds = blocks.map(_.id).toSet
    val cachedIds = sc.getPersistentRDDs.keySet -- trackedIds
    assert(cachedIds.nonEmpty, "the lazy cache should have materialized")
    // releasing the round must leave the cache usable
    LocalCheckpoints.release(blocks)
    assert(base.storageLevel.useMemory,
      "releasing a round's blocks destroyed an unrelated cache")
    assert(base.count() === 3)
    base.unpersist()
  }

  test("released checkpoint blocks actually leave the block manager") {
    val (ck, blocks) = LocalCheckpoints.tracked(Seq(1, 2).toDF("x"))
    val ids = blocks.map(_.id).toSet
    assert(ids.subsetOf(spark.sparkContext.getPersistentRDDs.keySet))
    LocalCheckpoints.release(blocks)
    // unpersist(blocking = false) is async; poll briefly
    val deadline = System.nanoTime + 10e9.toLong
    while (ids.exists(spark.sparkContext.getPersistentRDDs.keySet.contains)
      && System.nanoTime < deadline) Thread.sleep(50)
    assert(!ids.exists(spark.sparkContext.getPersistentRDDs.keySet.contains),
      "released blocks still registered after 10s")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Guards the sf1 perf-anchor fixture construction (BASELINE.md): the
  * scale-up must multiply fact rows by `factor` with collision-free
  * keys, keep dimension cardinality, and perturb replica content so
  * dup-pair structure scales LINEARLY (a replica must never be an
  * exact/near duplicate of the original — naive row duplication would
  * manufacture factor² pair growth and poison the anchor's
  * super-linearity analysis). */
class ScaleGenSpec extends SparkSpec {

  test("scale-up: factor x facts, 1x dims, disjoint keys, perturbed content") {
    val out = tmpDir("scalegen")
    ScaleGen.run(spark, "/root/testdata/sf0.001", out, factor = 2)

    def n(t: String): Long = spark.read.parquet(s"$out/$t.parquet").count()
    def src(t: String): Long =
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()

    assert(n("documents") === 2 * src("documents"))
    assert(n("lineitem") === 2 * src("lineitem"))
    assert(n("events") === 2 * src("events"))
    assert(n("region") === src("region"), "dims keep cardinality")
    assert(n("nation") === src("nation"), "dims keep cardinality")

    // keys collision-free across replicas
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() === n("documents"))

    // replica text is content-perturbed: exact dedup finds no
    // cross-replica copies beyond what the source corpus already has
    val srcDups = graft.operators.Dedup.exactDedup(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text").filter(col("n_copies") > 1).count()
    val outDups = graft.operators.Dedup.exactDedup(docs, "doc_id", "text")
      .filter(col("n_copies") > 1).count()
    assert(outDups === 2 * srcDups,
      "dup groups must scale linearly, not explode across replicas")

    // referential consistency: every scaled order still finds its customer
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val orphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    assert(orphans === 0L)
  }
}

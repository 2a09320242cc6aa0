package graft.operators

import graft.SparkSpec
import graft.catalog.TableCatalog

class Round9OpsSpec extends SparkSpec {

  test("exactSubstringDedup: skewSafe aggregate shape is hash-identical to the window shape on the gate corpus") {
    val docs = TableCatalog.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val window = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 20)
    val agg = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 20, skewSafe = true)
    assert(window.schema == agg.schema)
    assert(window.exceptAll(agg).isEmpty && agg.exceptAll(window).isEmpty)
    assert(window.count() == docs.count())
  }

  test("exactSubstringDedup skewSafe: hot-gram corpus (boilerplate) dedups identically under both shapes") {
    import spark.implicits._
    // one boilerplate sentence shared by every doc — the pathological
    // hot-gram case the skewSafe shape exists for
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = (1 to 40)
      .map(i => (i.toLong, s"$boiler unique${i}a unique${i}b unique${i}c"))
      .toDF("doc_id", "text")
    val window = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 8)
    val agg = Dedup.exactSubstringDedup(docs, "doc_id", "text", n = 8, skewSafe = true)
    assert(window.exceptAll(agg).isEmpty && agg.exceptAll(window).isEmpty)
    // the boilerplate tokens must actually have been removed
    assert(agg.filter($"n_removed" > 0).count() == 40L)
  }
}

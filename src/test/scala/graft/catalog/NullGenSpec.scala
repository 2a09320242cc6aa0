package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The null-planting fixture generator behind the fuzzer's
  * null-semantics sweep: the plant must be real (~1/7 per non-key
  * column), decorrelated across columns (correlated nulls would mask
  * bugs), and must never touch keys or join columns (the fuzz FK
  * templates rely on every FK resolving). */
class NullGenSpec extends SparkSpec {

  private lazy val dir: String = {
    val out = TestDirs.tempDirCleanedAtExit("graft_nullfix")
    graft.NullGen.run(spark, "/root/testdata/sf0.001", out)
    out
  }

  test("non-key columns carry ~1/7 nulls; keys and join columns carry none") {
    val c = TableCatalog.load(spark, dir, "customer")
    val n = c.count().toDouble
    val fracs = Seq("c_name", "c_acctbal", "c_mktsegment").map { col0 =>
      col0 -> c.filter(col(col0).isNull).count() / n
    }
    for ((name, f) <- fracs)
      assert(f > 0.08 && f < 0.22, s"$name null fraction $f outside ~1/7 band")
    assert(c.filter(col("c_custkey").isNull || col("c_nationkey").isNull).count() === 0)
  }

  test("nulls decorrelate across columns (per-column row offset)") {
    val c = TableCatalog.load(spark, dir, "customer")
    val both = c.filter(col("c_name").isNull && col("c_acctbal").isNull).count()
    assert(both === 0, "adjacent columns should null DIFFERENT rows")
  }

  test("every FK still resolves on the planted fixture") {
    val o = TableCatalog.load(spark, dir, "orders")
    val c = TableCatalog.load(spark, dir, "customer")
    val dangling = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    assert(dangling === 0)
  }
}

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

  test("nulls decorrelate across columns (near-independent overlap)") {
    // the crc32 plant makes per-column null sets pseudo-random, so a
    // pair overlaps on ~n/49 rows (independence), never on ~n/7
    // (correlation) and never on 0 by construction artifact
    val c = TableCatalog.load(spark, dir, "customer")
    val n = c.count().toDouble
    val both = c.filter(col("c_name").isNull && col("c_acctbal").isNull).count()
    assert(both < n * 0.06, s"pair overlap $both suggests correlated nulls (n=$n)")
    assert(both > 0, "zero overlap means the plant is an aligned artifact, not independent")
  }

  test("pairwise decorrelation holds across ALL planted columns of the widest table") {
    // lineitem is the widest fixture table (11 cols, 7 planted spanning
    // indices 0..10) — the r12 offset-only plant nulled columns 7 apart
    // on the SAME rows (ADVICE r12); the stride fix must leave NO
    // identical pair. One aggregate pass computes every pairwise overlap.
    val li = TableCatalog.load(spark, dir, "lineitem")
    val keys = Set("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val planted = li.columns.filterNot(keys).toSeq
    assert(planted.size >= 7, s"expected a wide planted set, got $planted")
    // BOTH directions per pair: a∖b alone would accept nulls(b) ⊊
    // nulls(a) — a strict-subset correlation this test exists to catch
    val aggs = for {
      (a, i) <- planted.zipWithIndex; b <- planted.drop(i + 1)
      (x, y) <- Seq((a, b), (b, a))
    } yield sum(when(col(x).isNull && !col(y).isNull, 1L).otherwise(0L))
      .as(s"${x}__$y")
    val row = li.agg(aggs.head, aggs.tail: _*).collect()(0)
    for (i <- 0 until row.length)
      assert(row.getLong(i) > 0L,
        s"null set containment for pair ${row.schema(i).name}")
  }

  test("every FK still resolves on the planted fixture") {
    val o = TableCatalog.load(spark, dir, "orders")
    val c = TableCatalog.load(spark, dir, "customer")
    val dangling = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").count()
    assert(dangling === 0)
  }
}

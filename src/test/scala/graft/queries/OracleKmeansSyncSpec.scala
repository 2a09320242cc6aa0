package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The k-means training algebra (assignment argmax → decimal-exact means
  * → empty-cluster carry) is replayed by several oracles — it must stay
  * bit-synchronized with `Vectors.kmeansTrain` in EVERY copy, or an edit
  * to one surfaces only as an opaque oracle-hash mismatch. This spec
  * extracts the rendered a1→c1 CTE chain from every oracle that carries
  * one and asserts all copies are character-identical (seeds may differ:
  * pinned LIMIT-k vs count-derived auto-k). A failure here names the
  * desynchronized oracle directly. */
class OracleKmeansSyncSpec extends AnyFunSuite {

  // newline-anchored: the PQ subspace codebooks render DIFFERENT chains
  // on purpose (16-dim slices under cb<s>-prefixed names) and must not
  // match here
  private val ChainStart = "\na1 AS (SELECT vec_id, cid FROM ("
  private val ChainEnd = "GROUP BY c0.cid)"

  private def chains(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    while ({ val i = sql.indexOf(ChainStart, from); i >= 0 && {
      val j = sql.indexOf(ChainEnd, i)
      assert(j > i, "unterminated k-means chain")
      out += sql.substring(i, j + ChainEnd.length)
      from = j + ChainEnd.length
      true
    }}) ()
    out.toSeq
  }

  test("every oracle's rendered k-means a1->c1 chain is identical") {
    val found = graft.SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      chains(sql).map(name -> _)
    }
    assert(found.size >= 7, // auto x2 share kmeansAutoCtes; pinned copies
      s"expected the known k-means replay sites, found ${found.size}")
    val canonical = found.head._2
    for ((name, chain) <- found)
      assert(chain == canonical,
        s"oracle '$name' carries a k-means chain that diverged from " +
          s"'${found.head._1}' — re-sync the training algebra")
  }
}

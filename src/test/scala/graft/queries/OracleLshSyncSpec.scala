package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The MinHash signature algebra (16 md5 hash slots over 3-gram
  * shingles, lexicographic min per slot) is replayed by ~18 oracles —
  * like the k-means chain (OracleKmeansSyncSpec), every copy must stay
  * synchronized with `Dedup.minhashLsh`'s Spark side or an edit to one
  * surfaces only as an opaque oracle-hash mismatch. This spec extracts
  * every rendered `sig AS (...)` CTE and asserts all copies carry the
  * identical algebra (whitespace-normalized: indentation legitimately
  * varies with each oracle's margin depth). A failure names the
  * desynchronized oracle directly. */
class OracleLshSyncSpec extends AnyFunSuite {

  private val Start = "sig AS (SELECT doc_id, h,"
  private val End = "GROUP BY doc_id, h)"

  private def chains(sql: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    while ({ val i = sql.indexOf(Start, from); i >= 0 && {
      val j = sql.indexOf(End, i)
      assert(j > i, "unterminated sig chain")
      out += sql.substring(i, j + End.length)
      from = j + End.length
      true
    }}) ()
    out.toSeq
  }

  // the shingle-source CTE NAME legitimately varies (sh vs sh0 where an
  // oracle carries two shingle sets) — canonicalize it, guard the algebra
  private def normalize(s: String): String =
    s.replaceAll("\\s+", " ").replaceAll("FROM sh\\w*", "FROM <shingles>").trim

  test("every oracle's rendered MinHash sig CTE carries identical algebra") {
    val found = graft.SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      chains(sql).map(name -> normalize(_))
    }
    assert(found.size >= 18,
      s"expected the known MinHash replay sites, found ${found.size}")
    val canonical = found.head._2
    for ((name, chain) <- found)
      assert(chain == canonical,
        s"oracle '$name' carries a MinHash sig CTE that diverged from " +
          s"'${found.head._1}' — re-sync the signature algebra")
  }
}

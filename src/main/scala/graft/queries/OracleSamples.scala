package graft.queries

/** Single source for the fixed-count query-sample algebra shared by the
  * ANN serve/recall oracles across query modules — the DuckDB twin of
  * `Similarity.fixedQuerySample` (the 20 hash-minimal vec_ids; see that
  * method's doc for why fixed-count sampling is the scale-honest eval
  * shape). One definition so the hash-gate-critical text cannot drift
  * between modules (the OracleSketches discipline). */
private[queries] object OracleSamples {

  /** Generic fixed-count sample CTE over any source/id — `src` may be a
    * table or an earlier CTE name. */
  def sampleCte(name: String, src: String, idCol: String, n: Int = 20): String =
    s"""$name AS (SELECT $idCol FROM (
       |    SELECT $idCol, md5($idCol::VARCHAR) AS ph FROM $src
       |    ORDER BY ph, $idCol LIMIT $n))""".stripMargin

  /** CTE `qs` — the fixed 20-query sample over the embeddings table. */
  val qsCte: String = sampleCte("qs", "embeddings", "vec_id")

  /** Row-PRESERVING fixed-count slice over any source/CTE — the oracle
    * twin of a corpus-side `Similarity.fixedQuerySample` (the pinned
    * dedup gates): keeps every column, same hash-minimal ordering. */
  def sliceCte(name: String, src: String, idCol: String, n: Int): String =
    s"""$name AS (SELECT * FROM $src
       |  ORDER BY md5($idCol::VARCHAR), $idCol LIMIT $n)""".stripMargin

  /** Membership predicate for a query alias's `vec_id`. */
  def qsPredOn(alias: String): String =
    s"$alias.vec_id IN (SELECT vec_id FROM qs)"

  /** The common `q`-aliased form. */
  val qsPred: String = qsPredOn("q")
}

package graft.queries

/** DuckDB-replay algebra shared by the DDSketch oracles (`t_ddsketch`,
  * `st_ddsketch_window`, `t_ddsketch_ledger`) — ONE copy of the gamma
  * constants, the 9-dp-log bucket expression, the rank-walk pick, and
  * the bucket-midpoint estimate, so the cross-engine bucket contract
  * cannot drift between gates (the recorded duplicated-oracle-algebra
  * trap; see OracleKmeansSyncSpec / OracleLshSyncSpec for the guarded
  * classes this one avoids joining). The Scala doubles interpolate via
  * Double.toString, which DuckDB parses back bit-identically.
  */
private[queries] object OracleSketches {
  val ddGamma: Double = (1 + 0.01) / (1 - 0.01)
  val ddLnGamma: Double = math.log(ddGamma)

  /** DDSketch bucket index of a positive SQL value expression. */
  def ddBucketSql(valueExpr: String): String =
    s"CAST(ceil(round(round(ln(CAST($valueExpr AS DOUBLE)), 9) / $ddLnGamma, 9)) AS BIGINT)"

  /** Rank-walk pick: the first bucket whose cumulative count reaches
    * rank ⌊q·(n−1)⌋+1 (q forced to DOUBLE so both engines run the
    * identical IEEE multiply). Expects `cum`, `n`, `bucket` in scope. */
  def ddPickSql(q: String, as: String): String =
    s"min(CASE WHEN cum >= CAST(floor(CAST($q AS DOUBLE) * (n - 1)) AS BIGINT) + 1 THEN bucket END) AS $as"

  /** Bucket-midpoint estimate 2γ^i/(γ+1), 6-dp rounded. */
  def ddMidpointSql(bucketCol: String, as: String): String =
    s"round(2.0 * power($ddGamma, $bucketCol) / ($ddGamma + 1.0), 6) AS $as"
}

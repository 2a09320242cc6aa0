package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the SURVEY §2 operator inventory as runnable entries;
  * `oracleSql` holds the DuckDB-equivalent SQL for the hash-match gate.
  * Query groups live under graft.queries.*; this object only aggregates.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline suite (dedup / similarity / text analysis).
    *
    * Execution contract: the harnesses (Verify, Bench, the driver) run
    * these one at a time. The stored-model gates (a_ann_*_stored,
    * d_minhash_stored, t_bpe_encode) write to a shared per-JVM model
    * dir under per-query-unique artifact names, so even concurrent
    * invocation cannot cross-clobber — but the SEQUENTIAL contract is
    * the tested one. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ParityQueries.queries ++
      graft.queries.MediaQueries.queries ++
      graft.queries.SinkQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.ParityQueries.oracleSql ++
      graft.queries.MediaQueries.oracleSql ++
      graft.queries.SinkQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql ++
      graft.queries.StatQueries.oracleSql
}

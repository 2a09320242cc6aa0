package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL pass-through surface of the reference, Spark-first.
  *
  * The reference forwards the user's SQL string to Spanner/BigQuery
  * (`/root/reference/src/main/java/com/mercari/solution/templates/SpannerToText.java:62-64`,
  * `BigQueryToSpanner.java:101-103`) and implements only two engine-level
  * behaviors around it, both reproduced here:
  *
  *   1. `--SPLITTER--` manual parallelism
  *      (`transforms/SpannerQueryIO.java:29,75`; README.md:95): the query
  *      string splits into N independent statements whose results are
  *      unioned. In Spark each statement is planned in parallel anyway, so
  *      the splitter survives purely as API semantics — a `unionByName` of
  *      the per-statement DataFrames (one Catalyst plan, no extra shuffle;
  *      the union is a narrow transformation).
  *
  *   2. `@param` binding (GoogleSQL named parameters, e.g. `IN UNNEST(@tables)`
  *      in `DummyToMutation.java:105-111`): rewritten to Spark's native
  *      named parameter markers (`:param`) and executed through
  *      `spark.sql(sql, args)`, so values bind as Catalyst literals —
  *      no string-splicing, injection-safe, and foldable for pushdown.
  *
  * The reference's non-partitionable fallback (`SpannerQueryIO.java:152-171`)
  * is intentionally absent: Spark plans ORDER BY / LIMIT queries in
  * parallel, so every valid query takes the fast path.
  */
object SqlRunner {

  val Splitter = "--SPLITTER--"

  /** `@name` → `:name`, skipping occurrences inside string literals. */
  def rewriteParams(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var inSingle = false; var inDouble = false; var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      c match {
        case '\'' if !inDouble => inSingle = !inSingle; out += c
        case '"' if !inSingle => inDouble = !inDouble; out += c
        case '@' if !inSingle && !inDouble &&
            i + 1 < sql.length && (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_') =>
          out += ':'
        case _ => out += c
      }
      i += 1
    }
    out.toString
  }

  /** Execute one statement with optional named params. */
  def sql(spark: SparkSession, statement: String,
          params: Map[String, Any] = Map.empty): DataFrame =
    if (params.isEmpty) spark.sql(statement)
    else spark.sql(rewriteParams(statement), params)

  /** Full reference semantics: split on --SPLITTER--, run each statement,
    * union results by column name. A `TimestampBound` has no meaning over
    * immutable files; the parameter is accepted and recorded for API parity.
    *
    * Pinned edge (decision, not accident): the split is a NAIVE substring
    * split — a `--SPLITTER--` occurring INSIDE a string literal still
    * splits the query, exactly as the reference's
    * `query.split("--SPLITTER--")` does (`SpannerQueryIO.java:29,75`).
    * Queries whose literals must contain the token don't exist in the
    * reference's surface; matching its behavior keeps migration
    * bug-for-bug safe. See SqlRunnerSpec "splitter inside a string
    * literal".
    */
  def run(spark: SparkSession, query: String,
          params: Map[String, Any] = Map.empty,
          timestampBound: Option[java.time.Instant] = None): DataFrame = {
    val statements = query.split(Splitter).map(_.trim).filter(_.nonEmpty)
    require(statements.nonEmpty, "empty query")
    statements.map(s => sql(spark, s, params)).reduce(_.unionByName(_))
  }
}

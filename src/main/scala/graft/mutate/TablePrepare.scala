package graft.mutate

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import graft.catalog.TableCatalog

/** CREATE TABLE DDL derivation from a DataFrame schema (reference
  * `transforms/dofns/SpannerTablePrepareDoFn.java:105-148`): the type-map
  * policy is STRING(MAX)/BYTES(MAX)/BOOL/FLOAT64/INT64/DATE/TIMESTAMP/
  * ARRAY<...>, decimals and times degrade to STRING(MAX) there; nested
  * RECORD/MAP columns are dropped (not writable, `StructToMutation
  * Converter.java:59-62`).
  *
  * In the reference this is a worker-side DDL RPC gated by a singleton
  * side-input barrier; in Spark the schema is plan-time information, so
  * prepare is a driver call before the write — no barrier needed
  * (SURVEY §3.2).
  */
object TablePrepare {

  /** DDL string for audit/logging and external-warehouse execution. */
  def ddl(table: String, schema: StructType, primaryKeys: Seq[String]): String = {
    val cols = schema.fields.toIndexedSeq
      .filter(f => !f.dataType.isInstanceOf[StructType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map { f =>
        val t = TableCatalog.sparkTypeToSpannerType(f.dataType) match {
          case "NUMERIC" => "STRING(MAX)" // SpannerTablePrepareDoFn.java:128-130
          case other => other
        }
        val notNull = if (primaryKeys.contains(f.name)) " NOT NULL" else ""
        s"  `${f.name}` $t$notNull"
      }
    require(primaryKeys.nonEmpty, "primaryKeys required")
    cols.mkString(s"CREATE TABLE `$table` (\n", ",\n", "\n)") +
      primaryKeys.mkString(" PRIMARY KEY (", ", ", ")")
  }

  /** Idempotent prepare against the Spark catalog: create the managed
    * table from the schema if absent (CREATE_IF_NEEDED parity). Returns
    * true if created. */
  def prepare(spark: SparkSession, table: String, schema: StructType,
              primaryKeys: Seq[String]): Boolean = {
    if (spark.catalog.tableExists(table)) false
    else {
      val fields = schema.fields.toIndexedSeq
        .filter(f => !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      val colsSql = fields.map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
      spark.sql(s"CREATE TABLE IF NOT EXISTS `$table` ($colsSql) USING parquet")
      true
    }
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog
import graft.operators.Multimodal

/** Multimodal pipeline as a driver-contract query. Media payloads are
  * synthesized from the documents table (text bytes play the opaque
  * binary role — no real media exists in the test data), then run
  * through the full plumbing: content stats (expressions) → stub decode
  * (mapPartitions batch fn → feature vector) → frame sampling.
  *
  * `m_media_pipeline` has no DuckDB oracle (the mapPartitions decode is
  * not SQL-expressible) → the driver records the rows-only check, per
  * contract. `m_media_stats` is the expression-only subset and IS
  * oracle-checked.
  */
object MediaQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "m_media_stats" -> ((s, dir) => {
      val media = TableCatalog.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("text").as("kind"),
          col("text").cast("binary").as("bytes"))
      Multimodal.withContentStats(media)
        .select("media_id", "n_bytes", "content_sha")
        .orderBy("media_id")
    }),

    "m_media_pipeline" -> ((s, dir) => {
      val media = TableCatalog.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("text").as("kind"),
          col("text").cast("binary").as("bytes"))
      val decoded = Multimodal.decodeStub(Multimodal.withContentStats(media), dims = 8)
      Multimodal.frameSample(decoded, n = 4, frameLen = 16)
        .select(col("media_id"), col("n_bytes"),
          size(col("features")).as("n_features"),
          size(col("frames")).as("n_frames"))
        .orderBy("media_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "m_media_stats" ->
      """SELECT doc_id AS media_id, strlen(text)::BIGINT AS n_bytes,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY media_id""".stripMargin
  )
}

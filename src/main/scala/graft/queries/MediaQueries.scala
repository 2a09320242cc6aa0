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

    // binary-payload exact dedup: Dedup.exactDedup works unchanged on a
    // binary column (md5 accepts binary), so media dedup is the same
    // one-hash-shuffle operator as text dedup. Duplicates are planted
    // (an id-shifted copy of every payload) since the corpus has none.
    "m_media_dedup" -> ((s, dir) => {
      val media = TableCatalog.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      val copies = media.select((col("media_id") + 1000000L).as("media_id"),
        col("bytes"))
      graft.operators.Dedup.exactDedup(
          media.unionByName(copies), "media_id", "bytes")
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
    "m_media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents)
        |SELECT min(media_id) AS media_id, md5(text) AS content_hash,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM m GROUP BY md5(text) ORDER BY media_id""".stripMargin,

    "m_media_stats" ->
      """SELECT doc_id AS media_id, strlen(text)::BIGINT AS n_bytes,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY media_id""".stripMargin
  )
}

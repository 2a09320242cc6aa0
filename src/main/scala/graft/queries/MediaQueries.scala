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

    // multimodal → similarity composition: stub-decoded feature vectors
    // (mapPartitions — the REAL plumbing) feed ANN top-k. Because the
    // stub derives features from sha256 of the payload, DuckDB can
    // replicate them exactly — so unlike m_media_pipeline this
    // composition is fully hash-checked end to end.
    "m_media_ann" -> ((s, dir) => {
      val media = TableCatalog.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      val feats = Multimodal.decodeStub(media, dims = 8)
        .select("media_id", "features")
      graft.operators.Similarity.bruteForceTopK(
          feats, feats.filter(col("media_id") % 97 === 0),
          "media_id", "features", k = 3)
        .select("qid", "nid", "cos", "rk")
        .orderBy("qid", "rk")
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

    "m_media_ann" -> {
      val cos = "round(list_dot_product(a.v::DOUBLE[], b.v::DOUBLE[]) / " +
        "(sqrt(list_dot_product(a.v::DOUBLE[], a.v::DOUBLE[])) * " +
        "sqrt(list_dot_product(b.v::DOUBLE[], b.v::DOUBLE[]))), 6)"
      s"""WITH f AS (SELECT doc_id AS media_id,
         |  list_transform(range(0, 8), j -> CAST((
         |    (strpos('0123456789abcdef', substring(sha256(text), 2*j + 1, 1)) - 1) * 16 +
         |    (strpos('0123456789abcdef', substring(sha256(text), 2*j + 2, 1)) - 1) - 128
         |  ) / 128.0 AS FLOAT)) AS v
         |  FROM documents),
         |sc AS (SELECT a.media_id AS qid, b.media_id AS nid, $cos AS cos
         |       FROM f a JOIN f b ON b.media_id <> a.media_id
         |       WHERE a.media_id % 97 = 0)
         |SELECT qid, nid, cos, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
         |  FROM sc)
         |WHERE rk <= 3 ORDER BY qid, rk""".stripMargin
    },

    "m_media_stats" ->
      """SELECT doc_id AS media_id, strlen(text)::BIGINT AS n_bytes,
        |  sha256(text) AS content_sha
        |FROM documents ORDER BY media_id""".stripMargin
  )
}

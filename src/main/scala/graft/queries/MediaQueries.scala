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

    // full near-dup composition for media: stub decode → trained k-means
    // quantizer → SemDeDup. Exact copies (planted, id-shifted) have
    // identical feature vectors, co-cluster by construction, and the
    // higher id drops at tau = 0.99 — the whole image-dedup pipeline
    // shape, hash-checked end to end because the stub features are
    // sha256-derived and engine-replicable.
    "m_media_semantic_dedup" -> ((s, dir) => {
      val media = TableCatalog.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      val all = media.unionByName(media.select(
        (col("media_id") + 1000000L).as("media_id"), col("bytes")))
      val feats = Multimodal.decodeStub(all, dims = 8)
        .select("media_id", "features")
      graft.operators.Dedup.semanticDedup(
          feats, "media_id", "features", k = 4, iters = 2, tau = 0.99)
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
        |FROM documents ORDER BY media_id""".stripMargin,

    "m_media_semantic_dedup" -> {
      def cos(a: String, b: String) =
        s"round(list_dot_product($a::DOUBLE[], $b::DOUBLE[]) / " +
          s"(sqrt(list_dot_product($a::DOUBLE[], $a::DOUBLE[])) * " +
          s"sqrt(list_dot_product($b::DOUBLE[], $b::DOUBLE[]))), 6)"
      // same sha256-feature CTE as m_media_ann (over originals + planted
      // copies), then the d_semantic_dedup kmeans/drop logic over it
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, text FROM documents),
         |f AS (SELECT media_id,
         |  list_transform(range(0, 8), j -> CAST((
         |    (strpos('0123456789abcdef', substring(sha256(text), 2*j + 1, 1)) - 1) * 16 +
         |    (strpos('0123456789abcdef', substring(sha256(text), 2*j + 2, 1)) - 1) - 128
         |  ) / 128.0 AS FLOAT)) AS v
         |  FROM m),
         |c0 AS (SELECT media_id AS cid, v AS cv FROM f ORDER BY media_id LIMIT 4),
         |a1 AS (SELECT media_id, cid FROM (
         |  SELECT e.media_id, c.cid,
         |    row_number() OVER (PARTITION BY e.media_id ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rk
         |  FROM f e CROSS JOIN c0 c) WHERE rk = 1),
         |m1 AS (SELECT a1.cid, d.dim,
         |         CAST(sum(CAST(CAST(e.v[d.dim] AS DOUBLE) AS DECIMAL(30,15))) AS DOUBLE)
         |           / count(*) AS mv
         |       FROM a1 JOIN f e USING (media_id),
         |            unnest(range(1, len(e.v) + 1)) AS d(dim)
         |       GROUP BY a1.cid, d.dim),
         |c1 AS (SELECT c0.cid,
         |         CASE WHEN count(m1.mv) = 0 THEN any_value(c0.cv)
         |              ELSE list(CAST(m1.mv AS FLOAT) ORDER BY m1.dim) END AS cv
         |       FROM c0 LEFT JOIN m1 ON m1.cid = c0.cid
         |       GROUP BY c0.cid),
         |assign AS (SELECT media_id, cid FROM (
         |  SELECT e.media_id, c.cid,
         |    row_number() OVER (PARTITION BY e.media_id ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS crk
         |  FROM f e CROSS JOIN c1 c) WHERE crk = 1),
         |dropped AS (SELECT DISTINCT b.media_id
         |  FROM assign a JOIN assign b ON a.cid = b.cid AND a.media_id < b.media_id
         |  JOIN f x ON x.media_id = a.media_id
         |  JOIN f y ON y.media_id = b.media_id
         |  WHERE ${cos("x.v", "y.v")} >= 0.99)
         |SELECT a.media_id, a.cid AS cluster_id, d.media_id IS NULL AS kept
         |FROM assign a LEFT JOIN dropped d USING (media_id)
         |ORDER BY a.media_id""".stripMargin
    }
  )
}

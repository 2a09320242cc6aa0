package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media payloads
  * are opaque `binary` columns with a typed metadata struct, processed by
  * per-partition batch functions. The Spark-side plumbing — schema,
  * partitioning, batch shape — is real and tested; the actual
  * image/audio decode is a clearly-marked STUB (no media libraries exist
  * in this container): `decodeStub` derives a deterministic fake feature
  * vector from the bytes so the pipeline shape (including joins against
  * `embeddings`-style tables downstream) can be exercised end-to-end.
  *
  * Scale notes: payload bytes never pass through a shuffle here — all
  * derivations are map-side; `frameSample` keeps only the sampled slices
  * so downstream stages shuffle kilobytes, not the raw media.
  */
object Multimodal {

  /** Canonical media schema: (media_id, kind, bytes, meta{mime, width,
    * height, duration_ms}). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Pure-expression metadata: size + content hash (codegen'd, no UDF). */
  def withContentStats(df: DataFrame, bytesCol: String = "bytes"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(bytesCol)).cast("long"))
      .withColumn("content_sha", sha2(col(bytesCol), 256))

  /** STUB decode → feature vector. Deterministic fake: `dims` floats
    * derived from sha2 of the payload, in [-1, 1). A real deployment
    * replaces the body of `fakeFeature` with the actual decoder
    * (image → CNN embedding etc.); signature and batch shape stay. */
  def decodeStub(df: DataFrame, dims: Int = 16,
                 bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(df.schema.fields.toIndexedSeq :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte] else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ fakeFeature(md, bytes, dims))
      }
    }(enc)
  }

  // ??? real decode goes here — deterministic stand-in for this container
  private def fakeFeature(md: java.security.MessageDigest, bytes: Array[Byte],
                          dims: Int): Seq[Float] = {
    md.reset()
    val h = md.digest(bytes)
    (0 until dims).map { i =>
      val b = h(i % h.length) & 0xff
      (b - 128) / 128.0f
    }
  }

  /** Frame-sample: cut `n` evenly spaced slices of `frameLen` bytes from
    * the payload (the video-frame-sampling shape: keep samples, drop the
    * payload). Pure expressions — `substring` on binary is codegen'd. */
  def frameSample(df: DataFrame, n: Int = 4, frameLen: Int = 16,
                  bytesCol: String = "bytes"): DataFrame = {
    val total = octet_length(col(bytesCol))
    val frames = transform(sequence(lit(0), lit(n - 1)), i => {
      val offset = (i * greatest(total - frameLen, lit(1)) / lit(math.max(n - 1, 1))).cast("int") + 1
      substring(col(bytesCol), offset, lit(frameLen))
    })
    df.withColumn("frames", frames).drop(bytesCol)
  }
}

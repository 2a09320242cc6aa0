package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media payloads
  * are opaque `binary` columns with a typed metadata struct, processed by
  * per-partition batch functions. Every `m_*` oracle runs on the REAL
  * codecs in this file (BMP, RIFF/WAVE, RIFF/AVI — public, bit-stable
  * container formats synthesized and parsed byte-for-byte); the only
  * external seam is a learned embedding MODEL (CNN/audio encoder), which
  * doesn't exist in this container — a deployment plugs one into the same
  * mapPartitions batch shape the codecs use (see `decodeBmp` and
  * `MediaDecodeStub` in test scope for the signature contract).
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

  /** Real BMP container encode: wrap payload bytes as an uncompressed
    * 24-bpp bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, rows
    * padded to the 4-byte stride the format mandates) of the given pixel
    * width — payload byte j becomes the j-th pixel-channel byte in
    * top-down row-major order, short images zero-pad the last row. This
    * gives the pipeline REAL media bytes to decode (the container format
    * is public and bit-stable), synthesized deterministically since no
    * media files exist in the test data. Map-side mapPartitions, same
    * batch seam as [[decodeBmp]]. */
  def encodeBmp(df: DataFrame, bytesCol: String = "bytes",
                width: Int = 4): DataFrame = {
    require(width > 0, s"width must be positive, got $width")
    val schema = StructType(df.schema.fields.toIndexedSeq :+
      StructField("bmp", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ bmpBytes(payload, width))
      }
    }(enc)
  }

  private[graft] def bmpBytes(payload: Array[Byte], width: Int): Array[Byte] = {
    val rowBytes = 3 * width
    val stride = ((rowBytes + 3) / 4) * 4
    val h = math.max(1, (payload.length + rowBytes - 1) / rowBytes)
    val size = 54 + stride * h
    val out = new Array[Byte](size) // zero-filled: pixel padding + row pad
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(2, size)            // file size
    le32(10, 54)             // pixel-array offset
    le32(14, 40)             // BITMAPINFOHEADER size
    le32(18, width); le32(22, h) // positive height = bottom-up
    le16(26, 1); le16(28, 24)    // planes, bpp
    le32(30, 0)              // BI_RGB (uncompressed)
    le32(34, stride * h)     // image size
    le32(38, 2835); le32(42, 2835) // 72 dpi in px/m
    var j = 0
    while (j < payload.length) {
      val ir = j / rowBytes // image row, 0 = top
      // bottom-up storage: top image row is the LAST file row
      out(54 + (h - 1 - ir) * stride + j % rowBytes) = payload(j)
      j += 1
    }
    out
  }

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** REAL BMP decode: parse the magic, pixel-array offset, dimensions,
    * bit depth and compression from the headers; walk the pixel array
    * respecting bottom-up vs top-down storage (height sign) and the
    * 4-byte row stride; emit per-band per-channel pixel SUMS as exact
    * integers (image rows split into `bands` horizontal bands by
    * `band = row * bands / h`; feature slot = band * 3 + channel).
    * Exact sums instead of float means keep the mapPartitions output
    * engine-portable — the 6-dp mean happens downstream in expression
    * land ([[bandMeanFeatures]]). Rejects non-BMP payloads and
    * unsupported encodings loudly rather than decoding garbage. */
  def decodeBmp(df: DataFrame, bmpCol: String = "bmp",
                bands: Int = 4): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("img_w", IntegerType, nullable = false),
      StructField("img_h", IntegerType, nullable = false),
      StructField("band_sums", ArrayType(LongType, containsNull = false)),
      StructField("band_counts", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bmpCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (w, h, sums, cnts) = parseBmp(bytes, bands)
        Row.fromSeq(r.toSeq ++ Seq(w, h, sums.toSeq, cnts.toSeq))
      }
    }(enc)
  }

  /** Quarantine-path BMP decode: like [[decodeBmp]] but a malformed
    * payload CLASSIFIES instead of failing the job — the 100 TB ingest
    * contract (one corrupt file must never kill a scan; it lands in a
    * quarantine partition with a stable reason code). Adds
    * `bmp_status` ('ok' or the validator's reason, message text up to
    * the first parenthesized detail — stable across payload sizes) and
    * the same decode columns as [[decodeBmp]], null on failure. Same
    * map-only mapPartitions seam, same strict validator underneath —
    * lenient here means classified, not accepted. */
  def decodeBmpLenient(df: DataFrame, bmpCol: String = "bmp",
                       bands: Int = 4): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("bmp_status", StringType, nullable = false),
      StructField("img_w", IntegerType, nullable = true),
      StructField("img_h", IntegerType, nullable = true),
      StructField("band_sums", ArrayType(LongType, containsNull = false),
        nullable = true),
      StructField("band_counts", ArrayType(LongType, containsNull = false),
        nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bmpCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        try {
          val (w, h, sums, cnts) = parseBmp(bytes, bands)
          Row.fromSeq(r.toSeq ++ Seq("ok", w, h, sums.toSeq, cnts.toSeq))
        } catch {
          case e: IllegalArgumentException =>
            Row.fromSeq(r.toSeq ++ Seq(reasonCode(e), null, null, null, null))
        }
      }
    }(enc)
  }

  /** Stable quarantine reason code from a validator failure: the message
    * up to the first parenthesized detail — every `require` in the three
    * parsers keeps its payload-dependent detail inside `(...)`, so the
    * code is stable across payload sizes and corrupt-byte values. */
  private[graft] def reasonCode(e: IllegalArgumentException): String = {
    val msg = Option(e.getMessage).getOrElse("invalid")
      .stripPrefix("requirement failed: ")
    msg.indexOf(" (") match {
      case -1 => msg
      case i => msg.substring(0, i)
    }
  }

  private[graft] def parseBmp(b: Array[Byte], bands: Int)
      : (Int, Int, Array[Long], Array[Long]) = {
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
      s"not a BMP payload (${b.length} bytes)")
    val off = rdLe32(b, 10)
    val dib = rdLe32(b, 14)
    val w = rdLe32(b, 18)
    val hRaw = rdLe32(b, 22)
    val bpp = rdLe16(b, 28)
    val comp = rdLe32(b, 30)
    require(dib >= 40, s"unsupported DIB header size ($dib)")
    require(bpp == 24 && comp == 0,
      s"only uncompressed 24-bpp supported (got bpp=$bpp compression=$comp)")
    require(w > 0 && hRaw != 0, s"bad dimensions (${w}x$hRaw)")
    val topDown = hRaw < 0
    // abs/stride in LONG: hRaw = Int.MinValue survives abs, and a crafted
    // header width near Int.MaxValue overflows 3*w to a negative stride —
    // the pixel loop would then silently run zero iterations and return
    // all-zero sums for a "valid" parse instead of rejecting loudly
    val hL = math.abs(hRaw.toLong)
    val strideL = ((3L * w + 3) / 4) * 4
    // bound each factor by the file size BEFORE multiplying — the
    // product of two adversarial near-2^31 dimensions overflows even
    // Long (2^32.6 * 2^31 > 2^63) back to a small/negative value that
    // would sail through the extent check below
    require(strideL <= b.length && hL <= b.length,
      s"dimensions exceed payload (${w}x$hL, ${b.length} bytes)")
    require(off >= 54 && off + strideL * hL <= b.length,
      s"truncated pixel array (need ${off + strideL * hL}, have ${b.length})")
    // the require bounds strideL*hL by b.length (an Int), so these fit
    val h = hL.toInt
    val rowBytes = 3 * w
    val stride = strideL.toInt
    val sums = new Array[Long](bands * 3)
    val cnts = new Array[Long](bands * 3)
    var ir = 0 // image row, 0 = top
    while (ir < h) {
      val band = (ir.toLong * bands / h).toInt
      val fileRow = if (topDown) ir else h - 1 - ir
      val base = off + fileRow * stride
      var o = 0
      while (o < rowBytes) {
        val k = band * 3 + o % 3
        sums(k) += (b(base + o) & 0xff)
        cnts(k) += 1
        o += 1
      }
      ir += 1
    }
    (w, h, sums, cnts)
  }

  /** Real WAV container encode: wrap payload bytes as a canonical RIFF/
    * WAVE file — 8-bit unsigned PCM mono (payload byte j = sample j,
    * the historical 8-bit PCM convention with silence at 0x80), `fmt `
    * then `data` chunks, even-byte chunk padding per the RIFF spec.
    * Same deterministic-synthesis role as [[encodeBmp]], audio flavor. */
  def encodeWav(df: DataFrame, bytesCol: String = "bytes",
                sampleRate: Int = 8000): DataFrame = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val schema = StructType(df.schema.fields.toIndexedSeq :+
      StructField("wav", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ wavBytes(payload, sampleRate))
      }
    }(enc)
  }

  private[graft] def wavBytes(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
    val dataLen = payload.length
    val pad = dataLen % 2 // RIFF chunks are word-aligned
    val riffLen = 4 + (8 + 16) + (8 + dataLen + pad)
    val out = new Array[Byte](8 + riffLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit = s.getBytes("US-ASCII")
      .copyToArray(out, off)
    tag(0, "RIFF"); le32(4, riffLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1)             // PCM
    le16(22, 1)             // mono
    le32(24, sampleRate)
    le32(28, sampleRate)    // byte rate = rate * channels * bytesPerSample
    le16(32, 1)             // block align
    le16(34, 8)             // bits per sample
    tag(36, "data"); le32(40, dataLen)
    System.arraycopy(payload, 0, out, 44, dataLen)
    out
  }

  /** REAL WAV decode: walk the RIFF chunk list (not fixed offsets — a
    * real file may carry LIST/fact chunks before `data`), validate the
    * `fmt ` contents (PCM, mono, 8-bit), and emit per-segment sample
    * statistics as exact integers: samples split into `segs` segments by
    * `seg = index * segs / n`; per segment the COUNT and the SUM OF
    * SQUARED amplitudes (sample − 128, the 8-bit PCM zero line). The
    * 6-dp RMS happens downstream in expression land ([[segRmsFeatures]]).
    * Output adds: sample_rate, n_samples, seg_sumsq, seg_counts, and
    * seg_zcs (per-segment zero-crossing counts — sign changes across the
    * 128 center line between consecutive samples, counted in the current
    * sample's segment; with RMS these are the classic cheap
    * silence/voicing features of audio curation). */
  def decodeWav(df: DataFrame, wavCol: String = "wav",
                segs: Int = 4): DataFrame = {
    require(segs > 0, s"segs must be positive, got $segs")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("seg_sumsq", ArrayType(LongType, containsNull = false)),
      StructField("seg_counts", ArrayType(LongType, containsNull = false)),
      StructField("seg_zcs", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(wavCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (rate, n, sumsq, cnts, zcs) = parseWav(bytes, segs)
        Row.fromSeq(r.toSeq ++ Seq(rate, n, sumsq.toSeq, cnts.toSeq, zcs.toSeq))
      }
    }(enc)
  }

  /** Quarantine-path WAV decode: the [[decodeBmpLenient]] contract for the
    * audio codec — a malformed payload CLASSIFIES (`wav_status` = stable
    * reason code, null decode columns) instead of failing the scan; same
    * strict validator underneath. */
  def decodeWavLenient(df: DataFrame, wavCol: String = "wav",
                       segs: Int = 4): DataFrame = {
    require(segs > 0, s"segs must be positive, got $segs")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("wav_status", StringType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("seg_sumsq", ArrayType(LongType, containsNull = false),
        nullable = true),
      StructField("seg_counts", ArrayType(LongType, containsNull = false),
        nullable = true),
      StructField("seg_zcs", ArrayType(LongType, containsNull = false),
        nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(wavCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        try {
          val (rate, n, sumsq, cnts, zcs) = parseWav(bytes, segs)
          Row.fromSeq(r.toSeq ++ Seq("ok", rate, n, sumsq.toSeq, cnts.toSeq,
            zcs.toSeq))
        } catch {
          case e: IllegalArgumentException =>
            Row.fromSeq(r.toSeq ++
              Seq(reasonCode(e), null, null, null, null, null))
        }
      }
    }(enc)
  }

  private[graft] def parseWav(b: Array[Byte], segs: Int)
      : (Int, Long, Array[Long], Array[Long], Array[Long]) = {
    def tagAt(off: Int): String =
      new String(b.slice(off, off + 4), "US-ASCII")
    require(b.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "WAVE",
      s"not a RIFF/WAVE payload (${b.length} bytes)")
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val id = tagAt(off)
      val len = rdLe32(b, off + 4)
      // extent check in LONG: a crafted length near Int.MaxValue makes
      // off + 8 + len wrap negative in Int arithmetic, passing the
      // bound — the sample loop would then AIOOBE (or the walk would
      // mis-step) instead of the documented loud reject
      require(len >= 0 && off.toLong + 8 + len <= b.length,
        s"chunk overruns the file ('$id', len=$len)")
      if (id == "fmt ") {
        require(len >= 16, s"fmt chunk too short ($len)")
        val codec = rdLe16(b, off + 8)
        val channels = rdLe16(b, off + 10)
        val bits = rdLe16(b, off + 22)
        require(codec == 1 && channels == 1 && bits == 8,
          s"only 8-bit mono PCM supported (codec=$codec channels=$channels bits=$bits)")
        rate = rdLe32(b, off + 12)
        require(rate > 0, s"bad sample rate ($rate)")
      } else if (id == "data") {
        dataOff = off + 8; dataLen = len
      }
      off += 8 + len + (len % 2) // chunks are word-aligned
    }
    require(rate > 0, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    val sumsq = new Array[Long](segs)
    val cnts = new Array[Long](segs)
    val zcs = new Array[Long](segs)
    var ampSum = 0L
    var i = 0
    while (i < dataLen) {
      val seg = (i.toLong * segs / dataLen).toInt
      val amp = (b(dataOff + i) & 0xff) - 128
      sumsq(seg) += amp.toLong * amp
      cnts(seg) += 1
      ampSum += amp
      i += 1
    }
    // mean-line zero crossings (DC offset removed — an all-positive
    // payload never crosses the fixed 128 center, so the fixed-center
    // ZCR is degenerate; the mean-centered form is the standard fix).
    // Integer-exact: amp_i - mean changes sign iff n·amp_i - S does.
    def below(j: Int): Boolean =
      dataLen.toLong * (((b(dataOff + j) & 0xff) - 128)) < ampSum
    i = 1
    while (i < dataLen) {
      if (below(i) != below(i - 1))
        zcs((i.toLong * segs / dataLen).toInt) += 1
      i += 1
    }
    (rate, dataLen.toLong, sumsq, cnts, zcs)
  }

  /** 6-dp per-segment RMS amplitude over [[decodeWav]]'s exact sums —
    * round(sqrt(sumsq / count), 6); silent (empty) segments score 0. */
  def segRmsFeatures(sumsq: Column, counts: Column): Column =
    zip_with(sumsq, counts, (s, c) =>
      when(c > lit(0L), round(sqrt(s.cast("double") / c), 6)).otherwise(lit(0.0)))

  /** 6-dp banded per-channel mean features over [[decodeBmp]]'s exact
    * sums — pure expressions (zip_with), so the only non-SQL step in the
    * decode pipeline is the byte-level parse itself. Empty bands (more
    * bands than rows) score 0.0. */
  def bandMeanFeatures(sums: Column, counts: Column): Column =
    zip_with(sums, counts, (s, c) =>
      when(c > lit(0L), round(s.cast("double") / c, 6)).otherwise(lit(0.0)))

  /** Real AVI (RIFF) video container encode: wrap payload bytes as an
    * uncompressed 24-bpp 'DIB ' video — RIFF('AVI ' LIST('hdrl' avih
    * LIST('strl' strh strf)) LIST('movi' '00db'×n)) — of `width`-pixel
    * by `frameRows`-row frames. Payload byte j becomes pixel-channel
    * byte j in (frame, top-down row, channel) order; each frame chunk
    * stores its rows bottom-up on the 4-byte stride, exactly like the
    * BMP pixel array (an AVI DIB frame IS a BMP pixel array without the
    * file header). The last frame zero-pads. Completes the image (BMP) /
    * audio (WAV) / video (AVI) triad of real, public, bit-stable
    * containers synthesized deterministically — no media files exist in
    * the test data. Map-side mapPartitions, same seam as [[encodeBmp]]. */
  def encodeAvi(df: DataFrame, bytesCol: String = "bytes",
                width: Int = 4, frameRows: Int = 4): DataFrame = {
    require(width > 0 && frameRows > 0,
      s"width and frameRows must be positive, got $width x $frameRows")
    val schema = StructType(df.schema.fields.toIndexedSeq :+
      StructField("avi", BinaryType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        Row.fromSeq(r.toSeq :+ aviBytes(payload, width, frameRows))
      }
    }(enc)
  }

  private[graft] def aviBytes(payload: Array[Byte], width: Int,
                                  frameRows: Int): Array[Byte] = {
    val rowBytes = 3 * width
    val stride = ((rowBytes + 3) / 4) * 4
    val frameBytes = rowBytes * frameRows // payload bytes per frame
    val frameChunk = stride * frameRows   // stored bytes per frame
    val nFrames = math.max(1, (payload.length + frameBytes - 1) / frameBytes)
    // sizes: avih 56, strh 56, strf 40; LIST bodies carry a 4-byte type
    val strlLen = 4 + (8 + 56) + (8 + 40)
    val hdrlLen = 4 + (8 + 56) + (8 + strlLen)
    val moviLen = 4 + nFrames * (8 + frameChunk)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = new Array[Byte](8 + riffLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def tag(off: Int, s: String): Unit =
      s.getBytes("US-ASCII").copyToArray(out, off)
    tag(0, "RIFF"); le32(4, riffLen); tag(8, "AVI ")
    var o = 12
    tag(o, "LIST"); le32(o + 4, hdrlLen); tag(o + 8, "hdrl"); o += 12
    tag(o, "avih"); le32(o + 4, 56); o += 8
    le32(o, 40000)          // dwMicroSecPerFrame (25 fps)
    le32(o + 16, nFrames)   // dwTotalFrames
    le32(o + 24, 1)         // dwStreams
    le32(o + 32, width); le32(o + 36, frameRows) // dwWidth, dwHeight
    o += 56
    tag(o, "LIST"); le32(o + 4, strlLen); tag(o + 8, "strl"); o += 12
    tag(o, "strh"); le32(o + 4, 56); o += 8
    tag(o, "vids"); tag(o + 4, "DIB ")
    le32(o + 20, 1)         // dwScale
    le32(o + 24, 25)        // dwRate (25 fps)
    le32(o + 32, nFrames)   // dwLength
    le16(o + 52, width); le16(o + 54, frameRows) // rcFrame right/bottom
    o += 56
    tag(o, "strf"); le32(o + 4, 40); o += 8
    le32(o, 40)             // biSize
    le32(o + 4, width); le32(o + 8, frameRows) // positive = bottom-up
    le16(o + 12, 1); le16(o + 14, 24)          // planes, bpp
    le32(o + 16, 0)         // BI_RGB
    le32(o + 20, frameChunk) // biSizeImage
    o += 40
    tag(o, "LIST"); le32(o + 4, moviLen); tag(o + 8, "movi"); o += 12
    var fr = 0
    while (fr < nFrames) {
      tag(o, "00db"); le32(o + 4, frameChunk); o += 8
      var j = 0
      while (j < frameBytes) {
        val p = fr * frameBytes + j
        if (p < payload.length) {
          val ir = j / rowBytes // top-down row within the frame
          out(o + (frameRows - 1 - ir) * stride + j % rowBytes) = payload(p)
        }
        j += 1
      }
      o += frameChunk
      fr += 1
    }
    out
  }

  /** REAL AVI decode: walk the RIFF chunk tree (nested LISTs — hdrl for
    * the headers, movi for the frames), validate strf (uncompressed
    * 24-bpp BI_RGB) with the same Long-arithmetic bounds discipline as
    * [[parseBmp]]/[[parseWav]], then walk every '00db' frame's bottom-up
    * strided pixel rows and emit PER-FRAME per-band per-channel pixel
    * sums/counts as exact integers (band = rowInFrame * bands / h,
    * feature slot = band * 3 + channel — the [[parseBmp]] layout, per
    * frame). Rejects non-AVI payloads and unsupported encodings loudly.
    * Output adds: n_frames, frame_w, frame_h,
    * frame_sums/frame_counts: array<array<long>> (one inner array per
    * frame). Downstream stages explode the per-frame arrays and finish
    * in expression land ([[bandMeanFeatures]]) — payload bytes never
    * pass through a shuffle. */
  def decodeAvi(df: DataFrame, aviCol: String = "avi",
                bands: Int = 4): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("n_frames", IntegerType, nullable = false),
      StructField("frame_w", IntegerType, nullable = false),
      StructField("frame_h", IntegerType, nullable = false),
      StructField("frame_sums",
        ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)),
      StructField("frame_counts",
        ArrayType(ArrayType(LongType, containsNull = false), containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(aviCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (w, h, sums, cnts) = parseAvi(bytes, bands)
        Row.fromSeq(r.toSeq ++ Seq(sums.length, w, h,
          sums.map(_.toSeq).toSeq, cnts.map(_.toSeq).toSeq))
      }
    }(enc)
  }

  /** Quarantine-path AVI decode: the [[decodeBmpLenient]] contract for the
    * video codec — a malformed payload CLASSIFIES (`avi_status` = stable
    * reason code, null decode columns) instead of failing the scan; same
    * strict validator underneath. */
  def decodeAviLenient(df: DataFrame, aviCol: String = "avi",
                       bands: Int = 4): DataFrame = {
    require(bands > 0, s"bands must be positive, got $bands")
    val schema = StructType(df.schema.fields.toIndexedSeq ++ Seq(
      StructField("avi_status", StringType, nullable = false),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("frame_w", IntegerType, nullable = true),
      StructField("frame_h", IntegerType, nullable = true),
      StructField("frame_sums",
        ArrayType(ArrayType(LongType, containsNull = false), containsNull = false),
        nullable = true),
      StructField("frame_counts",
        ArrayType(ArrayType(LongType, containsNull = false), containsNull = false),
        nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(aviCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        try {
          val (w, h, sums, cnts) = parseAvi(bytes, bands)
          Row.fromSeq(r.toSeq ++ Seq("ok", sums.length, w, h,
            sums.map(_.toSeq).toSeq, cnts.map(_.toSeq).toSeq))
        } catch {
          case e: IllegalArgumentException =>
            Row.fromSeq(r.toSeq ++
              Seq(reasonCode(e), null, null, null, null, null))
        }
      }
    }(enc)
  }

  private[graft] def parseAvi(b: Array[Byte], bands: Int)
      : (Int, Int, Array[Array[Long]], Array[Array[Long]]) = {
    def tagAt(off: Int): String =
      new String(b.slice(off, off + 4), "US-ASCII")
    require(b.length >= 12 && tagAt(0) == "RIFF" && tagAt(8) == "AVI ",
      s"not a RIFF/AVI payload (${b.length} bytes)")
    var w = -1; var h = -1
    var stride = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Int] // frame data offsets
    // walk a chunk run [off, end); LISTs recurse (hdrl/strl for headers,
    // movi for frames); all extent checks in Long — a crafted length
    // near Int.MaxValue must reject, not wrap (the parseWav discipline)
    def walk(off0: Int, end: Int): Unit = {
      var off = off0
      while (off + 8 <= end) {
        val id = tagAt(off)
        val len = rdLe32(b, off + 4)
        require(len >= 0 && off.toLong + 8 + len <= end,
          s"chunk overruns its parent ('$id', len=$len)")
        if (id == "LIST") {
          require(len >= 4, s"LIST chunk too short ($len)")
          walk(off + 12, off + 8 + len)
        } else if (id == "strf") {
          // single-video-stream scope: a second strf would re-dimension
          // frames already recorded under the first header — the feature
          // walk would then read past their chunk bounds. Reject loudly.
          require(stride < 0, "duplicate strf header")
          require(len >= 40, s"strf chunk too short ($len)")
          val base = off + 8
          val ww = rdLe32(b, base + 4)
          val hh = rdLe32(b, base + 8)
          val bpp = rdLe16(b, base + 14)
          val comp = rdLe32(b, base + 16)
          require(bpp == 24 && comp == 0,
            s"only uncompressed 24-bpp supported (bpp=$bpp compression=$comp)")
          require(ww > 0 && hh > 0, s"bad frame dimensions (${ww}x$hh)")
          val strideL = ((3L * ww + 3) / 4) * 4
          require(strideL <= b.length && hh <= b.length,
            s"frame dimensions exceed payload (${ww}x$hh, ${b.length} bytes)")
          require(strideL * hh <= b.length,
            s"frame extent exceeds payload (${strideL * hh} > ${b.length})")
          w = ww; h = hh; stride = strideL.toInt
        } else if (id == "00db") {
          require(stride > 0, "frame chunk before the strf header")
          require(len == stride * h,
            s"frame chunk length mismatch ($len != stride*h = ${stride * h})")
          frames += (off + 8)
        }
        off += 8 + len + (len % 2) // RIFF chunks are word-aligned
      }
    }
    walk(12, b.length)
    require(w > 0, "missing strf header")
    require(frames.nonEmpty, "missing movi frames")
    val rowBytes = 3 * w
    val sums = Array.ofDim[Long](frames.length, bands * 3)
    val cnts = Array.ofDim[Long](frames.length, bands * 3)
    var f = 0
    while (f < frames.length) {
      val base0 = frames(f)
      var ir = 0 // top-down row within the frame
      while (ir < h) {
        val band = (ir.toLong * bands / h).toInt
        val base = base0 + (h - 1 - ir) * stride // bottom-up storage
        var o = 0
        while (o < rowBytes) {
          val k = band * 3 + o % 3
          sums(f)(k) += (b(base + o) & 0xff)
          cnts(f)(k) += 1
          o += 1
        }
        ir += 1
      }
      f += 1
    }
    (w, h, sums, cnts)
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

package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * partition-local typed transforms (`mapPartitions` over the binary
  * column — the Scala analog of a Pandas-UDF `mapInPandas` stage).
  *
  * The decode kernel is a REAL pure-JVM decoder for the self-contained
  * formats that need no external codec: 24-bit uncompressed BMP (pixel
  * channel bytes, bottom-up rows, 4-byte stride) and RIFF/WAVE 16-bit PCM
  * (s16le samples, chunk walk). Payloads that validate as neither fall
  * back to a raw byte-intensity histogram — the documented behavior for
  * opaque/unknown media, never an error. Features are 16-bin L1-normalized
  * histograms (intensity for pixels/bytes, amplitude for audio samples) —
  * pure functions of the decoded content, reproducible everywhere. At
  * 100 TB the decode stage is embarrassingly parallel (no shuffle:
  * payloads stay in their input partitions; only the downstream
  * aggregation shuffles).
  */
object Multimodal {

  /** Wrap a payload column as (binary, metadata struct) — the ingestion
    * shape for opaque media columns.
    */
  def attachPayload(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("payload", col(payloadCol).cast("binary"))
      .withColumn(
        "media_meta",
        struct(
          octet_length(col("payload")).cast("long").as("n_bytes"),
          sha2(col("payload"), 256).as("content_sha256"),
          lit("application/octet-stream").as("mime")))

  val FeatureDim = 16

  /** Canonical encode width for [[bmp24Bytes]]: 16 px → 48-byte rows, a
    * multiple of 4, so the BMP stride adds no per-row pad and the pixel
    * area is exactly the input channels plus tail zeros.
    */
  val BmpWidthPx = 16

  // ---------------------------------------------------------------- BMP

  /** Minimal 24-bit bottom-up BMP writer (the encode stage / test-fixture
    * generator — no codec library exists offline, and none is needed for
    * this format). `channels` are raw per-pixel channel bytes laid
    * row-major TOP-DOWN at `widthPx`·3 bytes per row; the final row is
    * zero-padded. Standard 54-byte BITMAPFILEHEADER + BITMAPINFOHEADER,
    * positive height (= bottom-up row order), stride rounded to 4 bytes.
    */
  def bmp24Bytes(channels: Array[Byte], widthPx: Int = BmpWidthPx): Array[Byte] = {
    require(widthPx > 0, s"BMP width must be positive, got $widthPx")
    val rowData = widthPx * 3
    val stride = ((rowData + 3) / 4) * 4
    val height = math.max(1, (channels.length + rowData - 1) / rowData)
    val size = 54 + stride * height
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    buf.putInt(40).putInt(widthPx).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0).putInt(stride * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up: last display row is stored first
    while (y >= 0) {
      val from = y * rowData
      val take = math.max(0, math.min(rowData, channels.length - from))
      if (take > 0) buf.put(channels, from, take)
      var p = take
      while (p < stride) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse an uncompressed 24-bit BMP: validates magic/planes/bpp/
    * compression and the pixel-area bound, walks rows honoring the stride
    * and the height sign (positive = bottom-up, negative = top-down), and
    * returns the channel bytes row-major TOP-DOWN with stride padding
    * stripped. None when the payload is not such a BMP (the caller falls
    * back — malformed media must never kill a 100 TB job).
    */
  def decodeBmp24(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val offset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      planes != 1 || bpp != 24 || compression != 0)
      return None
    val h = math.abs(hRaw)
    // All size arithmetic in Long: a width near 2^31/3 wraps w*3 negative in
    // Int, and stride*h can pass 2^63 when both factors approach 2^31. The
    // early per-dimension bounds (each row and each row-count must fit the
    // payload) cap both factors at bytes.length ≤ 2^31, so the Long product
    // below cannot overflow.
    val rowDataL = 3L * w
    val strideL = ((rowDataL + 3L) / 4L) * 4L
    if (rowDataL > bytes.length || h.toLong > bytes.length) return None
    if (offset < 54 || offset.toLong + strideL * h > bytes.length) return None
    // rowData*h ≤ stride*h ≤ bytes.length − offset < 2^31 after the guard,
    // so the Int narrowings below are exact.
    val rowData = rowDataL.toInt
    val stride = strideL.toInt
    val out = new Array[Byte]((rowDataL * h).toInt)
    var y = 0
    while (y < h) {
      val srcRow = if (hRaw > 0) h - 1 - y else y
      System.arraycopy(bytes, offset + srcRow * stride, out, y * rowData, rowData)
      y += 1
    }
    Some(out)
  }

  // ---------------------------------------------------------------- WAV

  /** Minimal RIFF/WAVE writer for mono 16-bit PCM (fixture generator):
    * "fmt " (PCM, 1 channel, 16 bits) + "data" with s16le samples.
    */
  def wavPcm16Bytes(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataSize)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** Parse a RIFF/WAVE payload carrying 16-bit PCM: validates the RIFF/
    * WAVE magic, walks the chunk list (honoring the odd-size pad byte),
    * requires a PCM 16-bit "fmt " chunk, and decodes the "data" chunk as
    * s16le samples (all channels interleaved — the amplitude histogram is
    * channel-agnostic). None when the payload is not such a WAV.
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 44) return None
    def tag(o: Int) = new String(bytes, o, 4, StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // The chunk cursor walks in Long: with an Int cursor a crafted sz near
    // 2^31 wraps pos+8+sz negative PAST the bounds check and the next
    // tag/getShort read throws instead of returning None.
    var pos = 12L
    var fmtOk = false
    var data: Option[(Int, Int)] = None
    while (pos + 8 <= bytes.length) {
      val p = pos.toInt // pos < bytes.length ≤ 2^31 inside the loop
      val id = tag(p)
      val sz = buf.getInt(p + 4)
      if (sz < 0 || pos + 8L + sz > bytes.length) return None
      if (id == "fmt ") {
        if (sz < 16) return None
        fmtOk = buf.getShort(p + 8) == 1 && buf.getShort(p + 8 + 14) == 16
      } else if (id == "data") {
        data = Some((p + 8, sz))
      }
      pos += 8L + sz + (sz & 1)
    }
    if (!fmtOk) return None
    data.map { case (o, sz) =>
      val n = sz / 2
      val out = new Array[Short](n)
      var i = 0
      while (i < n) { out(i) = buf.getShort(o + 2 * i); i += 1 }
      out
    }
  }

  // ------------------------------------------------------------- kernel

  /** 16-bin L1-normalized intensity histogram of 8-bit values
    * (bin = value ≫ 4) — the feature for decoded pixel channels and the
    * opaque-payload fallback. Integer counts divided by the byte count:
    * one IEEE division per bin, engine-replicable.
    */
  def intensityHist(bs: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < bs.length) { hist((bs(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = math.max(bs.length, 1).toDouble
    hist.map(_ / n)
  }

  /** 16-bin L1-normalized amplitude histogram of s16 samples
    * (bin = (sample + 32768) ≫ 12) — the feature for decoded PCM audio.
    */
  def amplitudeHist(ss: Array[Short]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < ss.length) { hist((ss(i) + 32768) >> 12) += 1.0; i += 1 }
    val n = math.max(ss.length, 1).toDouble
    hist.map(_ / n)
  }

  /** The decode kernel: genuinely parse the payload (24-bit BMP pixels or
    * PCM-16 WAV samples) and feature-extract the decoded content; fall
    * back to the raw byte-intensity histogram for payloads that validate
    * as neither format. Pure function of the bytes. The parse branches run
    * under a Try so that even an unanticipated decoder defect degrades to
    * the opaque-payload histogram — malformed media must never kill a
    * 100 TB job (OutOfMemoryError and other fatal errors still propagate;
    * Try only absorbs parse-level exceptions).
    */
  def decodeKernel(bytes: Array[Byte]): Array[Double] =
    scala.util.Try {
      decodeBmp24(bytes).map(intensityHist)
        .orElse(decodeWavPcm16(bytes).map(amplitudeHist))
    }.toOption.flatten.getOrElse(intensityHist(bytes))

  // ------------------------------------------------------------- stages

  /** Partition-local ENCODE stage: (id, srcCol bytes) → (id, payload)
    * where payload is a real 24-bit BMP whose pixel channel bytes are the
    * source bytes ([[bmp24Bytes]]). In a production pipeline payloads
    * arrive already encoded; this stage is the deterministic fixture
    * generator that lets the decode path run — and be oracle-checked —
    * against genuine image binaries. Same mapPartitions shape as the
    * decode stage: no shuffle, bytes stay in their input partitions.
    */
  def encodeBmpPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(srcCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), bmp24Bytes(if (bytes == null) Array.emptyByteArray else bytes))
        }
      }(encoder)
  }

  /** Partition-local WAV ENCODE stage: (id, srcCol bytes) → (id, payload)
    * where payload is a real RIFF/WAVE PCM-16 binary whose samples are an
    * affine map of the source bytes (`s = (b − 64)·512`, spreading ASCII
    * text across the amplitude range) — the audio twin of
    * [[encodeBmpPayload]], letting the WAV decode path run and be
    * oracle-checked against genuine audio binaries.
    */
  def encodeWavPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("payload", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    df.select(col(idCol).cast("long"), col(srcCol).cast("binary"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val bs = if (bytes == null) Array.emptyByteArray else bytes
          val samples = new Array[Short](bs.length)
          var i = 0
          while (i < bs.length) { samples(i) = (((bs(i) & 0xff) - 64) * 512).toShort; i += 1 }
          Row(r.getLong(0), wavPcm16Bytes(samples))
        }
      }(encoder)
  }

  /** Partition-local decode stage: (id, payload) → (id, features[16]).
    * mapPartitions keeps the batch shape (one iterator per partition, no
    * per-row closure overhead) and never shuffles the payload bytes.
    */
  def decodeFeatures(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    // decode is CPU-bound and partition-local: rebalance so one small input
    // file doesn't serialize the kernel on a single core (no-op when the
    // input is already well-partitioned — Spread.byKey)
    Spread.byKey(df.select(col(idCol).cast("long"), col("payload")), col(idCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, decodeKernel(if (bytes == null) Array.emptyByteArray else bytes))
        }
      }(encoder)
  }

  /** Partition-local WAV decode to RAW samples: (id, payload) →
    * (id, samples: array<int>) via the genuine RIFF chunk walk
    * ([[decodeWavPcm16]]); payloads that fail validation decode to an
    * empty array. The per-frame energy/VAD features run off this — the
    * decoded TIMELINE, where [[decodeFeatures]] only keeps the global
    * histogram.
    */
  def decodeSamples(df: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("samples", ArrayType(IntegerType, containsNull = false))))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    Spread.byKey(df.select(col(idCol).cast("long"), col("payload")), col(idCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val ss = decodeWavPcm16(if (bytes == null) Array.emptyByteArray else bytes)
            .getOrElse(Array.emptyShortArray)
          Row(id, ss.map(_.toInt))
        }
      }(encoder)
  }

  /** Feature resize by mean-pooling: collapse each adjacent `factor`-sized
    * block of the `dims`-element feature vector into its mean — the
    * "resize" stage of an image/audio feature pipeline (downsampling a
    * spatial/spectral grid). `dims` is the INPUT length (so resizes chain:
    * 16→8→4), not tied to the decode kernel's dimension. Array-local, no
    * shuffle; the fixed left-to-right sum makes the result deterministic
    * and SQL-replicable.
    */
  def resizeFeatures(
      df: DataFrame,
      featuresCol: String,
      dims: Int,
      factor: Int,
      outCol: String): DataFrame = {
    require(dims > 0 && factor > 0 && dims % factor == 0,
      s"factor $factor must divide input dims $dims")
    val blocks = dims / factor
    val pooled = (0 until blocks).map { b =>
      val terms = (1 to factor).map(j => element_at(col(featuresCol), b * factor + j))
      (terms.reduce(_ + _) / lit(factor.toDouble)).as(s"p_$b")
    }
    df.withColumn(outCol, array(pooled: _*))
  }

  /** Frame sampling: chop the payload into fixed-size "frames" (one row per
    * frame with frame_idx) — the video-frame / audio-window expansion as a
    * generator, no UDTF needed.
    */
  /** Cross-modal alignment score — the CLIP/LAION-style curation gate
    * ("does the text actually describe the paired media?"): each document
    * is paired with its embedding on the shared id and scored by the
    * exact cosine between a DETERMINISTIC text-side vector and the
    * embedding. The text side is a signed hashed bag-of-words (feature
    * hashing, Weinberger et al. 2009): token t lands in dimension
    * `hashU24(t) % dims` with sign `±1` from the hash's next bit, counts
    * summed — an integer vector both engines regenerate from nothing (no
    * RNG, no shipped artifact), the same no-artifact contract as
    * `Vectors.randomProject`'s md5 sign matrix. LAION filtered at CLIP
    * cosine ≥ 0.28; the threshold is the caller's (calibrate it from the
    * per-source quantiles — `mm8_alignment_calib`).
    *
    * Determinism: the text vector is integer (exact sums), the dot is a
    * trunc-9 fixed-point sum of tv·x products (tie-free, the
    * `randomProject` rule for raw-float quantization), ‖t‖² is an exact
    * integer sum, ‖x‖² the proven DECIMAL(38,9) norm recipe, and the
    * closing cosine is one IEEE sqrt·sqrt·division dag on bit-identical
    * inputs. NULL when either norm is zero (no tokens that cancel, or a
    * zero embedding) — callers fail closed.
    *
    * Scale: the text vector is one explode + map-side-combined hash agg
    * (≤ dims rows per doc out); the dot is a co-partitioned equi-join on
    * the shared id (bucket both sides by id at 100 TB and the shuffle
    * disappears); nothing is corpus × corpus and no fit is needed at all.
    * Returns (docIdCol, align_score) for every doc with ≥1 token and a
    * paired embedding.
    */
  def alignmentScores(
      docs: DataFrame,
      embs: DataFrame,
      docIdCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    val tv = docs
      .select(col(docIdCol), explode(Text.tokens(col(textCol))).as("token"))
      .withColumn("__h", Sampling.hashU24(col("token")))
      .select(
        col(docIdCol),
        (pmod(col("__h"), lit(dims.toLong)) + 1L).as("d"),
        when(pmod(expr(s"__h DIV $dims"), lit(2L)) === 0L, 1L)
          .otherwise(-1L).as("s"))
      .groupBy(col(docIdCol), col("d"))
      .agg(sum(col("s")).as("tv"))
    val tn = tv.groupBy(col(docIdCol))
      .agg(sum(col("tv") * col("tv")).as("__n2t"))
    val e = embs.select(col(vecIdCol).as("__vid"), col(vecCol).as("__emb"))
    val dotp = tv.join(e, col(docIdCol) === col("__vid"))
      .groupBy(col(docIdCol))
      .agg(Exact.dsumTrunc9(
        col("tv").cast("double") *
          element_at(col("__emb"), col("d").cast("int")).cast("double")).as("__dot"))
    val n2x = embs.select(
      col(vecIdCol).as("__vid"), Vectors.norm2Exact(col(vecCol)).as("__n2x"))
    val denom = sqrt(col("__n2t").cast("double")) * sqrt(col("__n2x"))
    dotp.join(tn, docIdCol)
      .join(n2x, col(docIdCol) === col("__vid"))
      .select(
        col(docIdCol),
        (col("__dot") / when(denom === 0.0, lit(null)).otherwise(denom))
          .as("align_score"))
  }

  /** Oracle twin of [[alignmentScores]] for the DuckDB
    * documents/embeddings pair: CTE body ending in
    * `align(doc_id, align_score)`.
    */
  def sqlAlignment(dims: Int): String =
    s"""tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
                FROM documents),
        th AS (SELECT doc_id, ${Sampling.sqlHashU24("token")} AS h FROM tok),
        tv AS MATERIALIZED (SELECT doc_id, (h % $dims) + 1 AS d,
                CAST(sum(CASE WHEN (h // $dims) % 2 = 0 THEN 1 ELSE -1 END)
                  AS BIGINT) AS tv
              FROM th GROUP BY 1, 2),
        tn AS (SELECT doc_id, CAST(sum(tv * tv) AS BIGINT) AS n2t
               FROM tv GROUP BY 1),
        en AS (SELECT vec_id,
                 CAST(sum(CAST(CAST(embedding[i.i] AS DOUBLE)
                   * CAST(embedding[i.i] AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE) AS n2x
               FROM embeddings, unnest(generate_series(1, $dims)) AS i(i)
               GROUP BY 1),
        dotp AS (SELECT tv.doc_id,
                   ${Exact.sqlDsumTrunc9(
      "CAST(tv.tv AS DOUBLE) * CAST(e.embedding[tv.d] AS DOUBLE)")} AS dot
                 FROM tv JOIN embeddings e ON e.vec_id = tv.doc_id
                 GROUP BY 1),
        align AS (SELECT dp.doc_id,
                    dp.dot / nullif(sqrt(CAST(tn.n2t AS DOUBLE)) * sqrt(en.n2x),
                      CAST(0.0 AS DOUBLE)) AS align_score
                  FROM dotp dp JOIN tn ON tn.doc_id = dp.doc_id
                       JOIN en ON en.vec_id = dp.doc_id)"""

  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int): DataFrame = {
    val lastFrame = ((octet_length(col("payload")) - 1) / frameBytes).cast("int")
    df.select(
      col(idCol),
      posexplode(
        transform(
          sequence(lit(0), greatest(lastFrame, lit(0))),
          i => col("payload").substr(i * frameBytes + 1, lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }
}

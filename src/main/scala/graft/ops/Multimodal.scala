package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extract run as
  * partition-local typed transforms (`mapPartitions` over the binary
  * column — the Scala analog of a Pandas-UDF `mapInPandas` stage).
  *
  * The container has no image/audio codecs, so the DECODE KERNEL IS A
  * DETERMINISTIC FAKE (byte-value histogram standing in for
  * pixels/spectrogram — clearly marked below). Everything around it —
  * schema, binary handling, batch shape, partition locality, the generator
  * expansion for frame sampling — is the real production plumbing: swap
  * `fakeDecodeKernel` for a codec call and nothing else changes. At 100 TB
  * the decode stage is embarrassingly parallel (no shuffle: payloads stay
  * in their input partitions; only the downstream aggregation shuffles).
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

  /** DETERMINISTIC FAKE decode kernel: 16-bin byte-value histogram,
    * L1-normalized. Stands in for image decode + feature extraction; the
    * real implementation would call a codec here and emit e.g. an
    * embedding. Pure function of the bytes → reproducible everywhere.
    */
  def fakeDecodeKernel(bytes: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % FeatureDim) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    hist.map(_ / n)
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
          Row(id, fakeDecodeKernel(if (bytes == null) Array.emptyByteArray else bytes))
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

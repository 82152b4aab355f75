package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches — the Scala analog of a `mapInPandas` decode/feature stage.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives a deterministic fake feature vector
  * from the bytes. Everything around it — the schema contract, the
  * batch-iterator shape, the partition-level parallelism, repartitioning
  * by media type so one task decodes one codec — is the real design and
  * is tested (MultimodalSpec).
  */
object Multimodal {

  /** Media-row schema: opaque payload + typed metadata, the at-rest form
    * of a multimodal training corpus (payloads inline for small media;
    * at 100 TB the `payload` column holds a pointer + byte-range into
    * blob storage and this schema is unchanged).
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),  // image|audio|video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val featureDim = 8

  /** STUB decode/feature-extract: a real implementation would decode the
    * payload with an image/audio library and emit an embedding; the stub
    * emits a deterministic hash-derived vector with the same shape, so
    * the pipeline's schema, batching, and determinism are exercised
    * end-to-end.
    */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return Array.fill(featureDim)(0f)
    var h = 1125899906842597L  // deterministic FNV-ish rolling hash
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < featureDim) {
      val hj = h ^ (0x9E3779B97F4A7C15L * (j + 1))
      out(j) = ((hj % 1000003L).toFloat) / 1000003f
      j += 1
    }
    out
  }

  private val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("feature", ArrayType(FloatType))))

  /** Per-partition batched decode → feature column. Repartitions by
    * media_type first so each task touches one codec (cache/dictionary
    * locality at scale), then maps partitions with an iterator — the
    * rows stream through without materializing the partition.
    */
  def extractFeatures(media: DataFrame, partitions: Int = 0): DataFrame = {
    val repart =
      if (partitions > 0) media.repartition(partitions, col("media_type"))
      else media.repartition(col("media_type"))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    repart.select(col("media_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), decodeStub(payload).toSeq)
        }
      }(enc)
  }

  /** STUB resize: a real implementation decodes, scales, and re-encodes
    * the payload; the stub derives a deterministic smaller payload
    * (hash-sampled bytes, length proportional to the pixel ratio) so the
    * batch shape, metadata rewrite, and determinism are real.
    */
  private[graft] def resizeStub(payload: Array[Byte], srcW: Int, srcH: Int,
                                dstW: Int, dstH: Int): Array[Byte] = {
    if (payload == null || srcW <= 0 || srcH <= 0) return payload
    val ratio = (dstW.toLong * dstH).toDouble / (srcW.toLong * srcH)
    val outLen = math.max(1, (payload.length * math.min(ratio, 1.0)).toInt)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = payload((i.toLong * payload.length / outLen).toInt)
      i += 1
    }
    out
  }

  private val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Image resize stage: per-partition batched transform of image rows to
    * the target dimensions, metadata rewritten to match. Non-image rows
    * are excluded (resize is an image op; audio/video go through their
    * own stages).
    */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizedSchema)
    media.filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"), col("width"), col("height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val (w, h) = (if (r.isNullAt(2)) 0 else r.getInt(2), if (r.isNullAt(3)) 0 else r.getInt(3))
          Row(r.getLong(0), resizeStub(payload, w, h, dstW, dstH), dstW, dstH)
        }
      }(enc)
  }

  /** Frame-sampling plan for video rows: expands each video into
    * evenly-spaced sample timestamps (the Spark-side half of a frame
    * extractor; the decode of each frame is the same stub boundary).
    */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))).as("frame_ts_ms"))

  /** Synthetic media fixture for tests/benches (deterministic). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val tpe = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](32 + i % 64)(j => ((i * 31 + j) % 127).toByte)
      (i.toLong, tpe, payload,
        if (tpe == "image") Some(640) else None,
        if (tpe == "image") Some(480) else None,
        if (tpe != "image") Some(1000L * (1 + i % 30)) else None,
        Seq("jpeg", "opus", "h264")(i % 3))
    }
    rows.toDF("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")
  }
}

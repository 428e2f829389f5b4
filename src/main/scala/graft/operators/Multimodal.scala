package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct, and
  * the compute stages (decode → feature-extract / resize / frame-sample) run
  * as partition-local batch transforms.
  *
  * The actual media codecs are NOT in this environment, so `decodeStub`
  * below is a clearly-marked deterministic stand-in — but every Spark-side
  * decision is the real one a production pipeline needs:
  *
  *  - schema: `payload: binary` + `media: struct<...>` keeps the blob
  *    column-pruned away unless a stage actually needs bytes;
  *  - partition shape: `mapPartitions` over an iterator, so a JNI/FFI codec
  *    initializes once per partition (not per row) and rows stream through
  *    without materializing the partition;
  *  - repartition before decode: payload bytes dominate task size, so
  *    decode parallelism follows row count, not file-split count;
  *  - feature output: fixed-width `array<float>`, ready for the vector ops
  *    in [[graft.queries.SimilarityOps]] / `quantized_cosine`.
  */
object Multimodal {

  /** Typed media metadata carried beside the payload. */
  case class MediaMeta(
      modality: String, // image | audio | video
      width: Int, height: Int, channels: Int,
      sampleRateHz: Int, nFrames: Int)

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media: MediaMeta)

  case class DecodedRecord(
      doc_id: Long, media: MediaMeta, n_bytes: Long, content_id: String,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media", StructType(Seq(
      StructField("modality", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sampleRateHz", IntegerType),
      StructField("nFrames", IntegerType))), nullable = true)))

  /** STUB — deterministic stand-in for a real media decode + feature
    * extraction (the container has no image/audio codecs). A production
    * implementation swaps only this function: same signature, same
    * batch/partition shape. The fake "features" are moments of the byte
    * distribution, so they are stable across runs, partitionings, and
    * engines.
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec goes here (e.g. JPEG -> RGB -> CNN embedding)
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      out(i % dim) += b / 255.0f
      i += 1
    }
    var j = 0
    while (j < dim) { out(j) = out(j) / payload.length * dim; j += 1 }
    out
  }

  /** decode + feature-extract: partition-local, codec init once per
    * partition, streaming iterator in and out.
    */
  def decodeAndFeaturize(records: Dataset[MediaRecord], dim: Int = 16): Dataset[DecodedRecord] = {
    import records.sparkSession.implicits._
    records
      .repartition(records.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        // real pipeline: initialize the codec/model HERE, once per partition
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { r =>
          val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
          digest.reset()
          val id = digest.digest(bytes).map("%02x".format(_)).mkString
          DecodedRecord(r.doc_id, r.media, bytes.length.toLong, id,
            decodeStub(bytes, dim))
        }
      }
  }

  /** resize: pure metadata rewrite at this layer (the payload transform is
    * part of the decode stub); keeps aspect-correct target dims.
    */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame = {
    // non-spatial modalities (audio) carry 0x0 dims: scale 1, no-op resize
    val side = greatest(col("media.width"), col("media.height"))
    val scale = when(side <= 0, lit(1.0))
      .otherwise(least(lit(1.0), lit(maxSide) / side))
    // the least() clamp matters: ceil(dim * (maxSide/side)) can overshoot
    // maxSide by 1 when the scale ratio rounds up in double (e.g. 293 at
    // maxSide=224 -> 224.00000000000003 -> ceil 225)
    df.withColumn("target_width",
        least(ceil(col("media.width") * scale), lit(maxSide.toLong))
          .cast(IntegerType))
      .withColumn("target_height",
        least(ceil(col("media.height") * scale), lit(maxSide.toLong))
          .cast(IntegerType))
  }

  /** frame-sample: every k-th frame index per video row, row-local. */
  def frameSamplePlan(df: DataFrame, everyK: Int): DataFrame =
    df.filter(col("media.modality") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("media.nFrames") - 1, lit(everyK))))
}

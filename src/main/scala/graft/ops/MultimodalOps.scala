package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._
import Tables._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * payloads are opaque `binary` columns with typed metadata structs. The
  * sandbox has no image/audio codecs, so the decode kernels are STUBS —
  * deterministic functions of the bytes with the same schema/partitioning/
  * batch shape a real decoder (libjpeg/ffmpeg behind mapPartitions or Arrow
  * batches) would have. The Spark-side plumbing — binary casting, metadata
  * extraction, per-partition batch iteration, frame sampling — is real and
  * tested.
  */
object MultimodalOps {

  /** STUB image decode: a real implementation would decode the payload with
    * a codec inside `mapPartitions` (one codec instance per partition, Arrow
    * batch in/out). Here: deterministic pseudo-dimensions from the leading
    * bytes, same output schema a decoder would produce. */
  def decodeImageMeta(payload: Column): Column = struct(
    (abs(xxhash64(payload)) % 1920 + 16).cast("int").as("width"),
    (abs(xxhash64(payload, lit(1))) % 1080 + 16).cast("int").as("height"),
    (length(payload) % 3 + 1).cast("int").as("channels"))

  /** STUB frame sampling: every `stride`-th fixed-size block of the payload
    * stands in for a decoded video frame. Real impl: ffmpeg keyframe
    * extraction per partition. Output shape (array of frame digests) is what
    * a downstream dedup/embedding stage would consume. */
  def sampleFrames(payload: Column, blockSize: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(ceil(length(payload) / lit(blockSize * stride)).cast("int") - 1, lit(0))),
      i => md5(substring(payload, (i * blockSize * stride + 1).cast("int"), lit(blockSize))))

  /** Typed decoded-asset record (what a real decoder would emit). */
  case class DecodedAsset(assetId: Long, width: Int, height: Int,
      channels: Int, nBytes: Long, digest: String)

  /** Batched decode plumbing via mapPartitions — the Scala analogue of a
    * Pandas/Arrow batch UDF: ONE "codec" initialization per partition (real
    * impl: a libjpeg/ffmpeg handle, model session, etc.), then a streamed
    * iterator over the partition's assets. The decode kernel itself is the
    * deterministic stub; the partition/batch shape, typed output schema and
    * per-partition init are exactly what a real decoder needs. */
  def decodeBatched(assets: DataFrame): Dataset[DecodedAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init happens HERE (once), not per row
        val codec = new StubCodec
        it.map { case (id, bytes) => codec.decode(id, bytes) }
      }
  }

  /** Deterministic stand-in for a native decoder handle. */
  final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(id: Long, bytes: Array[Byte]): DecodedAsset = {
      md.reset(); val d = md.digest(bytes).map("%02x".format(_)).mkString
      val h = java.util.Arrays.hashCode(bytes).toLong & 0x7FFFFFFFL
      DecodedAsset(id, (h % 1920 + 16).toInt, (h / 1920 % 1080 + 16).toInt,
        (bytes.length % 3) + 1, bytes.length.toLong, d)
    }
  }

  val all: Seq[OpQuery] = Seq(

    // Binary metadata extraction: the documents' text payload cast to binary
    // is the opaque blob; length/digest are codec-independent and
    // oracle-checkable, the decode stub is deterministic plumbing.
    OpQuery("q31_binary_meta",
      (s, d) => t(s, d, "documents").select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        md5(col("text").cast("binary")).as("digest")),
      Some("""SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
             |  md5(text) AS digest
             |FROM documents""".stripMargin)),

    // Decode + frame-sample plumbing (stubbed kernels, real schema/flow):
    // binary payload → typed metadata struct → per-asset frame digests →
    // flat table a dedup stage would join on. No SQL oracle (stub-specific);
    // MultimodalSpec asserts schema, determinism and batch shape.
    OpQuery("q32_multimodal_pipeline",
      (s, d) => {
        val assets = t(s, d, "documents").select(
          col("doc_id").as("asset_id"),
          col("text").cast("binary").as("payload"),
          col("source"))
        assets
          .withColumn("meta", decodeImageMeta(col("payload")))
          .withColumn("frames", sampleFrames(col("payload"), blockSize = 64, stride = 4))
          .select(col("asset_id"), col("source"),
            col("meta.width"), col("meta.height"), col("meta.channels"),
            size(col("frames")).as("n_frames"),
            col("frames")(0).as("first_frame_digest"))
      },
      None))
}

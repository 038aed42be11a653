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
    * batch in/out). Here: deterministic pseudo-dimensions carved out of the
    * payload's md5 (hex → 60-bit ints) — oracle-expressible in any engine
    * with md5, unlike the round-1 xxhash64 variant. */
  def decodeImageMeta(payload: Column): Column = {
    val md = md5(payload)
    def hex60(start: Int): Column =
      conv(substring(md, start, 15), 16, 10).cast("long")
    struct(
      (hex60(1) % 1905 + 16).cast("int").as("width"),
      (hex60(17) % 1065 + 16).cast("int").as("height"),
      (octet_length(payload) % 3 + 1).cast("int").as("channels"))
  }

  /** STUB frame sampling: every `stride`-th fixed-size character block of
    * the text stands in for a decoded video frame (a real impl slices BYTE
    * ranges via ffmpeg keyframe extraction; character blocks keep the stub
    * oracle-expressible — SQL substring is character-based in both engines).
    * Output shape (array of frame digests) is what a downstream
    * dedup/embedding stage would consume. */
  def sampleFrames(text: Column, blockChars: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(ceil(length(text) / lit(blockChars * stride)).cast("int") - 1, lit(0))),
      i => md5(substring(text, (i * blockChars * stride + 1).cast("int"), lit(blockChars)).cast("binary")))

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
    // flat table a dedup stage would join on. The md5-derived stub makes the
    // whole pipeline DuckDB-expressible, so this row is oracle-checked;
    // MultimodalSpec additionally asserts schema, determinism and batch shape.
    OpQuery("q32_multimodal_pipeline",
      (s, d) => {
        val assets = t(s, d, "documents").select(
          col("doc_id").as("asset_id"),
          col("text").cast("binary").as("payload"),
          col("text"), col("source"))
        assets
          .withColumn("meta", decodeImageMeta(col("payload")))
          .withColumn("frames", sampleFrames(col("text"), blockChars = 64, stride = 4))
          .select(col("asset_id"), col("source"),
            col("meta.width"), col("meta.height"), col("meta.channels"),
            size(col("frames")).as("n_frames"),
            col("frames")(0).as("first_frame_digest"))
      },
      Some("""SELECT doc_id AS asset_id, source,
             |  CAST(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1905 + 16 AS INT) AS width,
             |  CAST(CAST(('0x' || substr(md5(text), 17, 15)) AS BIGINT) % 1065 + 16 AS INT) AS height,
             |  CAST(octet_length(CAST(text AS BLOB)) % 3 + 1 AS INT) AS channels,
             |  CAST(GREATEST(CEIL(length(text) / 256.0) - 1, 0) + 1 AS INT) AS n_frames,
             |  md5(substring(text, 1, 64)) AS first_frame_digest
             |FROM documents""".stripMargin)))
}

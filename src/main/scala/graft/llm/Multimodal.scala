package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column handling: media ride along as opaque `binary` columns with
 * a typed metadata struct; decode / feature-extraction runs batched per
 * partition so a real decoder (JNI image lib, or `mapInPandas` on the PySpark
 * side) can amortize setup per-batch, not per-row.
 *
 * The container has no image/audio libraries, so [[FakeDecoder]] is a
 * clearly-marked deterministic stand-in: the Spark-side plumbing — schema,
 * batch shape, partition-wise iteration, feature schema — is real and tested;
 * only the innermost decode math is fake.
 */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(
      doc_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features (what a decode/resize/frame-sample stage emits). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      content_sha: String,
      // decoded-feature stand-ins (mean "pixel", n "frames")
      mean_value: Double,
      n_frames: Int)

  /** Batched decoder contract — one call per partition-batch, not per row. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /**
   * Deterministic fake decoder (STUB — a real build plugs libjpeg/ffmpeg or a
   * Pandas UDF here). Features are pure functions of the bytes so tests and
   * the DuckDB oracle can reproduce them.
   */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = rows.map { r =>
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.content).map("%02x".format(_)).mkString
      val mean =
        if (r.content.isEmpty) 0.0
        else r.content.map(b => (b & 0xFF).toLong).sum.toDouble / r.content.length
      MediaFeatures(r.doc_id, r.media_type, r.content.length.toLong, sha,
        math.rint(mean * 100) / 100, r.content.length / 64 + 1)
    }
  }

  /**
   * Synthesize a media table from the documents table (deterministic: bytes =
   * UTF-8 of text). Stands in for `spark.read.format("binaryFile")`.
   */
  def mediaFromDocuments(docs: DataFrame): DataFrame = docs.select(
    col("doc_id"),
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
    encode(col("text"), "UTF-8").as("content"),
    lit(64).as("width"), lit(64).as("height"), lit(16000).as("sample_rate"))

  /**
   * Partition-batched feature extraction. `repartition` first if media blobs
   * are large relative to `spark.sql.files.maxPartitionBytes` — each task
   * should hold one decoder instance and a bounded batch in memory.
   */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(it => decoder.decodeBatch(it))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus typed metadata; decode /
  * feature-extraction runs as batched per-partition transforms (the Scala
  * analog of `mapInPandas`): one task per partition, vectorized iteration,
  * decode library called per batch. The actual codec is STUBBED here (no
  * image/audio libs in this environment) behind `FakeCodec` — a
  * deterministic stand-in with the real interface — so the Spark-side
  * schema, partitioning and batch shape are real and tested.
  */
object Multimodal {

  /** Typed media row: payload + metadata, the storage schema for a media
    * lake table (partition by modality, then date in production).
    */
  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], mime: String)

  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 n_frames: Int, feature: Array[Float])

  /** The decode seam. A real deployment plugs libjpeg/ffmpeg etc. in
    * here; the fake is deterministic in the payload bytes so tests are
    * stable. Called once per batch (partition) — amortizes codec init.
    */
  trait Codec extends Serializable {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  object FakeCodec extends Codec {
    def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        val n = r.payload.length.toLong
        // Deterministic pseudo-decode: dimensions & features derived from
        // byte content — stands in for a real pixel/sample decode.
        val w = 16 + (n % 64).toInt
        val h = 16 + ((n / 64) % 64).toInt
        val frames = if (r.modality == "video") 1 + (n % 30).toInt else 1
        val feat = Array.tabulate(8) { i =>
          var acc = 0L
          var j = i
          while (j < r.payload.length) { acc += r.payload(j) & 0xff; j += 8 }
          (acc % 1000).toFloat / 1000f
        }
        MediaFeatures(r.media_id, r.modality, n, w, h, frames, feat)
      }
  }

  /** Batched decode over partitions. Repartitions to `parallelism` first
    * when the upstream has too few splits (binary blobs are often few,
    * large files).
    */
  def decodeFeatures(media: Dataset[MediaRow], codec: Codec,
                     parallelism: Option[Int] = None): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val part = parallelism.map(media.repartition(_)).getOrElse(media)
    part.mapPartitions(codec.decodeBatch)
  }

  /** Frame sampling plan for video: every `stride`-th frame index as rows
    * (the downstream decode fetches only those frames). Pure sequence
    * expression — demonstrates the explode-side plumbing.
    */
  def sampleFrames(features: DataFrame, stride: Int): DataFrame =
    features
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("media_id"), col("frame_idx"))
}

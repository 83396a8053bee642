package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The DECODE step is a STUB — image/audio codec libraries are not in
  * this environment. `decodeStub` computes a deterministic fake feature
  * vector from the raw bytes. Everything around it — the binary column,
  * the metadata struct, the mapPartitions batch shape, partition-count
  * preservation — is the real plumbing a production decode would use
  * (swap `decodeStub` for an actual codec call per partition, reusing a
  * decoder instance across the partition's rows).
  */
object Multimodal {

  case class Asset(asset_id: Long, bytes: Array[Byte], kind: String, n_bytes: Long)
  case class AssetFeatures(asset_id: Long, n_bytes: Long, mean_byte: Double,
                           width: Int, height: Int, checksum: Long)

  /** Wrap a text column as a fake binary asset with typed metadata —
    * stands in for reading image blobs from object storage. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("asset_id"),
      col(textCol).cast("binary").as("bytes"),
      lit("fake/image").as("kind"),
      length(col(textCol).cast("binary")).cast("long").as("n_bytes"))

  /** STUB decoder: deterministic pseudo-features of the byte stream.
    * A real implementation would decode pixels here; the Spark-side
    * contract (one decoder per partition, streaming rows) is identical. */
  private def decodeStub(a: Asset): AssetFeatures = {
    var sum = 0L
    var crc = 0L
    var i = 0
    while (i < a.bytes.length) {
      sum += a.bytes(i) & 0xff
      crc = crc * 31 + (a.bytes(i) & 0xff)
      i += 1
    }
    val mean = if (a.bytes.length == 0) 0.0 else sum.toDouble / a.bytes.length
    // fake dims derived from length — a real decoder reads the header
    val w = 16 + (a.n_bytes % 64).toInt
    val h = 16 + (a.n_bytes % 48).toInt
    AssetFeatures(a.asset_id, a.n_bytes, mean, w, h, crc)
  }

  /** Feature extraction over asset partitions. mapPartitions (not a
    * per-row UDF) so a real decoder would amortize init cost per
    * partition; output keeps the input partitioning. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes"), col("kind"), col("n_bytes"))
      .as[Asset]
      .mapPartitions(_.map(decodeStub))
  }

  case class Frame(asset_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Video-analog frame sampling: one row per sampled frame. The STUB
    * "demuxer" emits every stride-th byte window of length frameSize (a
    * real one would seek keyframes); the plumbing — row-expanding
    * flatMap, frames stay with their asset's partition, no shuffle — is
    * exactly what a production frame sampler does. */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
                   frameSize: Int, stride: Int): Dataset[Frame] = {
    import spark.implicits._
    assets.select(col("asset_id"), col("bytes")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = if (bytes.length < frameSize) 0
                else (bytes.length - frameSize) / stride + 1
        (0 until n).iterator.map(i =>
          Frame(id, i, java.util.Arrays.copyOfRange(bytes, i * stride, i * stride + frameSize)))
      }
  }
}

package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travel as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample run as partition-local
  * batch functions over `Dataset[T]` (`mapPartitions` — the Scala analog of
  * a vectorized `mapInPandas` stage: one JVM call per batch of rows, no
  * per-row driver involvement, schema known to Catalyst on both sides).
  *
  * The codec layer is STUBBED: this container has no image/audio libraries,
  * so `decodeStub` derives deterministic fake pixels/features from the bytes
  * (length + rolling hash). The Spark-side contracts — schema, partitioning,
  * batch shape, binary handling — are real and tested; swapping in a real
  * decoder replaces only the body of the partition function.
  */
object Multimodal {

  case class MediaItem(id: Long, media: Array[Byte], format: String)
  case class DecodedImage(id: Long, width: Int, height: Int, channels: Int,
      feature: Array[Float])
  case class FrameSample(id: Long, frameIdx: Int, feature: Array[Float])

  /** Attach a binary media column synthesized from a string column — lets the
    * pipeline be exercised on the text testdata until real media lands.
    */
  def withSyntheticMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).as("id"), col(textCol).cast("binary").as("media"),
      lit("synthetic/raw").as("format")).as[MediaItem]
  }

  /** STUB decode: a real implementation would decode JPEG/PNG bytes here
    * (e.g. via a native codec per partition). The fake is deterministic in
    * the bytes so downstream stages are testable.
    */
  def decodeImages(items: Dataset[MediaItem], featureDim: Int = 8): Dataset[DecodedImage] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        // ??? real codec goes here — deterministic fake below
        val h = m.media.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
        val width = 16 + math.floorMod(h, 16).toInt
        val height = 16 + math.floorMod(h >> 8, 16).toInt
        val feat = Array.tabulate(featureDim)(i =>
          (math.floorMod(h >> (i * 4), 1024) / 1024.0f))
        DecodedImage(m.id, width, height, 3, feat)
      }
    }
  }

  /** STUB resize: recomputes metadata; a real impl transforms pixel buffers
    * partition-locally with identical schema flow.
    */
  def resize(images: Dataset[DecodedImage], w: Int, h: Int): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map(img => img.copy(width = w, height = h)))
  }

  /** STUB frame sampling for video bytes: emits every `stride`-th fake frame;
    * the real impl would demux + decode keyframes per partition.
    */
  def sampleFrames(items: Dataset[MediaItem], nFrames: Int = 4,
      featureDim: Int = 8): Dataset[FrameSample] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val h = m.media.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
      (0 until nFrames).map { f =>
        val fh = h * (f + 1)
        FrameSample(m.id, f,
          Array.tabulate(featureDim)(i => math.floorMod(fh >> (i * 4), 1024) / 1024.0f))
      }
    }
  }

  /** Media dataset summary — the kind of partition-pruned scan a curation
    * pipeline runs before an expensive decode stage (byte sizes only; the
    * binary column is never materialized on the driver).
    */
  def mediaStats(items: Dataset[MediaItem]): DataFrame =
    items.groupBy(col("format")).agg(
      count(lit(1)).as("n_items"),
      avg(length(col("media"))).as("avg_bytes"),
      max(length(col("media"))).as("max_bytes"))
}

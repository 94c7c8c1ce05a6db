package graft.multimodal

import graft.ingest.Pages.mix64
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata.
  *
  * The Spark-side plumbing is real — schema, partitioning, per-partition
  * batched processing, deterministic outputs; the codec layer is a STUB
  * (this container ships no image/audio libraries): `decodeStub` derives
  * deterministic pseudo-metadata from the bytes where a real deployment
  * would call an actual decoder inside the same `mapPartitions` batch loop
  * (or `mapInPandas`/`applyInArrow` from PySpark). Every stub is marked.
  */
object Media {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])
  final case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
      duration_ms: Long, n_frames: Int)
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  private val kinds = Array("image", "audio", "video")

  /** Deterministic fake media corpus: pure function of (seed, id); byte
    * payload sized/filled from the hash. Distributed generation, no driver
    * data.
    */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 16): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val h = mix64(seed ^ i)
      val kind = kinds((java.lang.Long.remainderUnsigned(h, 3L)).toInt)
      val len = 256 + (java.lang.Long.remainderUnsigned(mix64(h), 1024L)).toInt
      val bytes = new Array[Byte](len)
      var j = 0
      var x = h
      while (j < len) { x = mix64(x); bytes(j) = (x & 0xff).toByte; j += 1 }
      MediaRow(i, kind, bytes)
    }
  }

  /** STUB decode: a real implementation calls the image/audio codec here
    * (per-partition, so codec state amortizes across the batch). The stub
    * derives deterministic dimensions from a stable byte-prefix hash —
    * the schema, null-handling and batching are production-shaped.
    */
  def decode(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // >>> STUB: codec initialization would happen once per partition here
      it.map { m =>
        val h = mix64(java.util.Arrays.hashCode(m.bytes.take(16)).toLong)
        val w = 64 + (java.lang.Long.remainderUnsigned(h, 1920L)).toInt
        val hgt = 64 + (java.lang.Long.remainderUnsigned(mix64(h), 1080L)).toInt
        val dur = if (m.kind == "image") 0L else 1000L + java.lang.Long.remainderUnsigned(h, 600000L)
        val frames = if (m.kind == "video") 1 + (dur / 40).toInt else if (m.kind == "image") 1 else 0
        Decoded(m.media_id, m.kind, w, hgt, dur, frames)
      }
    }
  }

  /** Deterministic feature extraction: 32-dim embedding from chunked byte
    * hashes (a real model inference would run here, batched per partition;
    * the output schema `array<float>` feeds [[graft.sim.Ann]] unchanged).
    */
  def features(media: Dataset[MediaRow], dims: Int = 32): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val f = new Array[Float](dims)
        var d = 0
        while (d < dims) {
          var acc = mix64(m.media_id ^ (d.toLong << 32))
          val step = math.max(1, m.bytes.length / 16)
          var j = 0
          while (j < m.bytes.length) { acc = mix64(acc ^ m.bytes(j)); j += step }
          f(d) = (acc.toDouble / Long.MaxValue.toDouble).toFloat
          d += 1
        }
        MediaFeature(m.media_id, f)
      }
    }
  }

  /** Frame sampling for video rows: every `every`-th frame index with a
    * deterministic content hash per frame (STUB for actual frame decode).
    * Output: (media_id, frame_idx, frame_hash).
    */
  def sampleFrames(media: Dataset[MediaRow], every: Int = 25): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decode(media).where(col("kind") === "video")
      .select(col("media_id"), col("n_frames"))
      .as[(Long, Int)]
      .flatMap { case (id, nFrames) =>
        (0 until nFrames by every).map(f => (id, f, mix64(id ^ f.toLong)))
      }.toDF("media_id", "frame_idx", "frame_hash")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns with typed metadata, and the expensive
  * per-item work (decode, feature extraction, resize, frame sampling)
  * runs batched inside `mapPartitions` — the Scala counterpart of a
  * Pandas-UDF/`mapInPandas` stage: executors stream row batches through
  * a codec without ever collecting to the driver.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * environment): [[FakeCodec]] produces deterministic bytes-derived
  * outputs with the real shapes, so the Spark-side plumbing — schema,
  * partitioning, batch iteration, output schema — is real and tested,
  * and swapping in a JNI/JavaCV codec is a one-function change.
  */
object Multimodal {

  /** A media item: opaque payload + typed metadata (FIXTURES-style). */
  final case class MediaItem(
      mediaId: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      durationMs: Long)

  /** Decoded/feature-extracted record. */
  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      featureDim: Int,
      features: Array[Float],
      ok: Boolean)

  /** A sampled video frame (decode stub keeps shapes honest). */
  final case class Frame(mediaId: Long, frameIndex: Int, ptsMs: Long, pixels: Array[Byte])

  /** STUB codec — deterministic fakes derived from the payload bytes.
    * Replace `decodeFeatures`/`decodeFrame` with a real codec binding in
    * production; everything around them is the real pipeline. */
  object FakeCodec {
    /** ??? in spirit: a real build links an image/audio decoder here. */
    def decodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 0xcbf29ce484222325L
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
      i = 0
      while (i < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(i) = ((h >>> 40).toInt & 0xffff).toFloat / 65536.0f
        i += 1
      }
      out
    }
    def decodeFrame(bytes: Array[Byte], frameIndex: Int): Array[Byte] = {
      val out = new Array[Byte](16) // 4x4 thumbnail stand-in
      var i = 0
      while (i < out.length) {
        out(i) = (bytes((frameIndex * 7 + i) % math.max(bytes.length, 1)) ^ frameIndex).toByte
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table (payload = seeded bytes), used
    * by tests in lieu of real files. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(i)
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val bytes = new Array[Byte](256 + (i % 128).toInt)
      rnd.nextBytes(bytes)
      MediaItem(i, kind, bytes, 64 + (i % 64).toInt, 64, 1000L * (1 + i % 30))
    }
  }

  /** Batched decode + feature extraction: one codec instance per
    * partition, rows streamed through it (the mapInPandas shape). */
  def extractFeatures(items: Dataset[MediaItem], dim: Int = 64): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition codec init would go here (expensive at real scale)
      it.map { m =>
        val feats = FakeCodec.decodeFeatures(m.bytes, dim)
        MediaFeatures(m.mediaId, m.kind, dim, feats, ok = m.bytes.nonEmpty)
      }
    }
  }

  /** Frame sampling for video rows: every `everyMs` milliseconds,
    * exploded to one row per frame. */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long = 5000L): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, (m.durationMs / everyMs).toInt)
      (0 until n).iterator.map { f =>
        Frame(m.mediaId, f, f * everyMs, FakeCodec.decodeFrame(m.bytes, f))
      }
    }
  }

  /** Metadata-only projection (never deserializes payloads — column
    * pruning keeps the binary out of the scan entirely). */
  def metadataSummary(items: Dataset[MediaItem]): DataFrame =
    items.toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("bytes"))).as("total_bytes"),
        avg(col("durationMs")).as("avg_duration_ms"))
      .orderBy("kind")
}

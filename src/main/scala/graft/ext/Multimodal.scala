package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata extracted by a batched per-partition decode.
  *
  * The decode itself is a STUB — the real image/audio libraries are not in
  * this container — but the Spark-side plumbing is real and tested: schema,
  * binary column handling, `mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas`: one iterator per partition so a real decoder could load its
  * model/codec once per partition, not per row).
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, fmt: String)

  /** Attach a fake media `binary` column (UTF-8 bytes of the text — a
    * deterministic stand-in for real image bytes). */
  def withFakeMedia(df: DataFrame): DataFrame =
    df.withColumn("media", encode(col("text"), "UTF-8"))

  /** STUB geometry shared by decode/resize (and mirrored by the q_mm_meta
    * oracle): fake (width, height) as a deterministic function of the byte
    * length. Single source — a real decoder replaces exactly this. */
  private def fakeDims(n: Long): (Long, Long) = (64L + n % 512, 64L + (n * 7) % 512)

  /** STUB decode: derives deterministic fake metadata from the byte length.
    * Replace the body marked STUB with a real codec (e.g. javax.imageio /
    * JNI ffmpeg) — the partition-batched contract stays identical. */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // A real decoder would initialize its codec HERE, once per partition.
        it.map { case (id, bytes) =>
          // STUB: pretend-decode; deterministic function of the bytes.
          val n = bytes.length.toLong
          val (w, h) = fakeDims(n)
          MediaMeta(id, n, w, h, "fake/rgb8")
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, width: Long, height: Long,
      media: Array[Byte])

  /** STUB resize to a bounding box: real code would decode → scale → re-encode
    * per partition; the stub deterministically truncates/repeats bytes to the
    * target "pixel" count so downstream schema/size contracts are exercised. */
  def resize(df: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val (w0, h0) = fakeDims(n)
          val scale = math.min(1.0, math.min(maxW.toDouble / w0, maxH.toDouble / h0))
          val (w, h) = (math.max(1L, (w0 * scale).toLong), math.max(1L, (h0 * scale).toLong))
          // STUB: a real implementation re-encodes; we size the buffer as w*h/64
          val out = java.util.Arrays.copyOf(bytes, math.max(1, (w * h / 64).toInt))
          ResizedMedia(id, w, h, out)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB frame sampling for video-like media: every k-th "frame" (fixed-size
    * byte window) becomes a row — the explode-shaped generator contract a real
    * ffmpeg-backed sampler would keep. */
  def sampleFrames(df: DataFrame, everyK: Int, frameBytes: Int = 16): Dataset[Frame] = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        // STUB: windows of the raw bytes stand in for decoded frames.
        bytes.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % everyK == 0 }
          .map { case (chunk, i) => Frame(id, i, chunk) }
      }
  }
}

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
          MediaMeta(id, n, 64L + n % 512, 64L + (n * 7) % 512, "fake/rgb8")
        }
      }
  }
}

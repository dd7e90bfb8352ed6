package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata extracted by a batched per-partition decode.
  *
  * The decode is REAL for BMP (a pure-JVM header+pixel parse of the public
  * BITMAPINFOHEADER layout — no codec library needed); other formats fall
  * back to a documented deterministic STUB, since the general image/audio
  * libraries are not in this container. Either way the Spark-side plumbing is
  * real and tested: schema, binary column handling, `mapPartitions` batch
  * shape (the Scala analogue of `mapInPandas`: one iterator per partition so
  * a real decoder can set up its codec once per partition, not per row).
  */
object Multimodal {

  /** Encode a real 24-bit bottom-up BMP (54-byte header + BGR rows padded to
    * 4 bytes). `pixel(x, y)` returns 0xRRGGBB. Public format: the 14-byte
    * file header then BITMAPINFOHEADER. */
  def encodeBmp(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val stride = (width * 3 + 3) & ~3
    val size = 54 + stride * height
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(stride * height).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        b.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte).put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Real BMP header parse: (width, |height|, bits-per-pixel) for any byte
    * array carrying the 'BM' magic and a full BITMAPINFOHEADER (height is
    * negative for top-down files — magnitude is the pixel height). */
  def decodeBmpDims(bytes: Array[Byte]): Option[(Long, Long, Int)] =
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) None
    else {
      val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (w, h, bpp) = (b.getInt(18), b.getInt(22), b.getShort(28).toInt)
      // magic alone is two printable letters — validate the full header shape
      // so arbitrary text bytes can't masquerade as an image. Real-world BMPs
      // commonly carry 0 (or a stale value) in bfSize, so the size field is
      // advisory; the load-bearing bound is that the buffer actually holds
      // offBits + rowStride(w, bpp) × |h| pixel bytes.
      val sizeField = b.getInt(2)
      val offBits = b.getInt(10)
      val stride = ((w.toLong * bpp + 31) / 32) * 4 // rows pad to 4 bytes
      val shapeOk = b.getInt(14) == 40 && w > 0 && h != 0 &&
        Set(1, 4, 8, 16, 24, 32).contains(bpp) && offBits >= 54
      val sizeOk = (sizeField == bytes.length || sizeField == 0) &&
        bytes.length.toLong >= offBits.toLong + stride * math.abs(h.toLong)
      if (shapeOk && sizeOk) Some((w.toLong, math.abs(h).toLong, bpp)) else None
    }

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

  /** Partition-batched metadata decode. BMP bytes are decoded for REAL
    * (header parse, `fmt = image/bmp`); anything else takes the deterministic
    * STUB path (`fmt = fake/rgb8`). Extending to more formats (e.g. a
    * javax.imageio or JNI-ffmpeg branch) changes only the per-row match —
    * the partition-batched contract stays identical. */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // A heavier decoder would initialize its codec HERE, once per partition.
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          decodeBmpDims(bytes) match {
            case Some((w, h, _)) => MediaMeta(id, n, w, h, "image/bmp")
            case None =>
              // STUB: pretend-decode; deterministic function of the bytes.
              val (w, h) = fakeDims(n)
              MediaMeta(id, n, w, h, "fake/rgb8")
          }
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, width: Long, height: Long,
      media: Array[Byte])

  /** Decode a 24-bit bottom-up BMP (the layout [[encodeBmp]] writes) into
    * (width, height, pixel accessor returning 0xRRGGBB). Builds on
    * [[decodeBmpDims]]' full header validation; None for anything that
    * isn't the positive-height 24-bit layout. */
  def decodeBmp24(bytes: Array[Byte]): Option[(Int, Int, (Int, Int) => Int)] =
    decodeBmpDims(bytes) match {
      case Some((w, h, 24)) =>
        val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (b.getInt(22) <= 0) None // top-down: not the encodeBmp layout
        else {
          val offBits = b.getInt(10)
          val (wi, hi) = (w.toInt, h.toInt)
          val stride = (wi * 3 + 3) & ~3
          Some((wi, hi, (x: Int, y: Int) => {
            val off = offBits + (hi - 1 - y) * stride + x * 3 // bottom-up rows
            (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
              ((bytes(off + 2) & 0xff) << 16)
          }))
        }
      case _ => None
    }

  /** Aspect-preserving fit of (w0, h0) into (maxW, maxH) in EXACT integer
    * arithmetic (cross-multiplied ratio compare, floor division) — no float
    * scale factor, so any engine reproduces the target dims bit-for-bit. */
  private[ext] def fitBox(w0: Int, h0: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w0 <= maxW && h0 <= maxH) (w0, h0)
    else if (w0.toLong * maxH <= maxW.toLong * h0) // height-bound
      (math.max(1, (w0.toLong * maxH / h0).toInt), maxH)
    else
      (maxW, math.max(1, (h0.toLong * maxW / w0).toInt))

  /** Resize media to fit a bounding box. REAL for 24-bit BMP — decode →
    * nearest-neighbor remap (source index `x·w0/w` in integer floor
    * division) → re-encode, all exact integer arithmetic, so the full
    * decode→resize→re-encode round trip is oracle-checkable — and a
    * documented deterministic STUB for other formats (truncate/repeat bytes
    * to the target "pixel" count; real code would hand the partition
    * iterator to a codec, set up once per partition). */
  def resize(df: DataFrame, maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    require(maxW >= 1 && maxH >= 1, s"bad box ${maxW}x$maxH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeBmp24(bytes) match {
            case Some((w0, h0, px)) =>
              val (w, h) = fitBox(w0, h0, maxW, maxH)
              val out = encodeBmp(w, h,
                (x, y) => px((x * w0) / w, (y * h0) / h))
              ResizedMedia(id, w.toLong, h.toLong, out)
            case None =>
              val n = bytes.length.toLong
              val (w0, h0) = fakeDims(n)
              val scale = math.min(1.0, math.min(maxW.toDouble / w0, maxH.toDouble / h0))
              val (w, h) = (math.max(1L, (w0 * scale).toLong), math.max(1L, (h0 * scale).toLong))
              // STUB: a real implementation re-encodes; buffer sized w*h/64
              val out = java.util.Arrays.copyOf(bytes, math.max(1, (w * h / 64).toInt))
              ResizedMedia(id, w, h, out)
          }
        }
      }
  }

  final case class BmpStats(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, px_sum: Long)

  /** Exact pixel checksum of a 24-bit BMP column: decode every pixel and sum
    * the 0xRRGGBB values — the verification tail that proves a
    * decode→transform→re-encode pipeline preserved actual pixel data, not
    * just headers. Non-BMP rows are dropped (this is a BMP verifier). */
  def bmpPixelStats(df: DataFrame): Dataset[BmpStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeBmp24(bytes).map { case (w, h, px) =>
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { s += px(x, y); x += 1 }
              y += 1
            }
            BmpStats(id, w.toLong, h.toLong, bytes.length.toLong, s)
          }
        }
      }
  }

  final case class AHash(doc_id: Long, ahash: Long)

  /** Perceptual AVERAGE-HASH of a 24-bit BMP column — the image analog of
    * [[graft.ext.Dedup.simhash32]] for near-duplicate IMAGE dedup: decode,
    * reduce to an 8×8 grid of luminance block means, and set bit (by·8+bx)
    * iff the block outshines the whole image. Re-encodes, crops, small
    * overlays, and compression noise move few blocks relative to the global
    * mean, so perceptual duplicates land within a small Hamming distance
    * while unrelated images sit near 32.
    *
    * Exactness: luminance is the integer sum r+g+b (scaling by 1/3 cannot
    * change any comparison), block boundaries are the ⌊i·dim/8⌋ grid, and
    * the bit test cross-multiplies block and global SUMS over their pixel
    * counts — no float means, so the 64-bit hash is bit-identical on every
    * partitioning and engine. Non-BMP rows are dropped (BMP is the real
    * decode path; other codecs stub per [[decodeMeta]]).
    *
    * Scale shape: decode + hash is row-local `mapPartitions` (the codec
    * seam), output is 16 bytes/row regardless of image size — the pair
    * stage ([[ahashPairs]]) never touches pixels. */
  def bmpAHash(df: DataFrame): Dataset[AHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeBmp24(bytes).map { case (w, h, px) =>
            val blockSum = Array.ofDim[Long](64)
            val blockCnt = Array.ofDim[Long](64)
            var y = 0
            while (y < h) {
              val by = y * 8 / h
              var x = 0
              while (x < w) {
                val bx = x * 8 / w
                val p = px(x, y)
                val lum = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                blockSum(by * 8 + bx) += lum
                blockCnt(by * 8 + bx) += 1
                x += 1
              }
              y += 1
            }
            val totalSum = blockSum.sum
            val totalCnt = blockCnt.sum
            // blockMean > globalMean, exact: blockSum/blockCnt > totalSum/totalCnt.
            // The cross-products stay within Long while totalSum*blockCnt(b)
            // < 2^63: totalSum <= 765*px and blockCnt(b) <= px, so any image
            // past ~1.4e8 pixels could wrap — route those through Math
            // .multiplyHigh-free BigInt compares instead of silently flipping
            // bits (a 30000x30000 BMP is valid input).
            val big = totalCnt > 0 && totalSum > Long.MaxValue / totalCnt
            var hash = 0L
            var b = 0
            while (b < 64) {
              val bit =
                if (blockCnt(b) == 0) false
                else if (!big) blockSum(b) * totalCnt > totalSum * blockCnt(b)
                else BigInt(blockSum(b)) * totalCnt > BigInt(totalSum) * blockCnt(b)
              if (bit) hash |= (1L << b)
              b += 1
            }
            AHash(id, hash)
          }
        }
      }
  }

  /** Near-duplicate image pairs from [[bmpAHash]] fingerprints at Hamming
    * distance ≤ `maxHam`, banded: split the 64-bit hash into `bands`
    * equal-width slices and equi-join on (band, slice) — two hashes within
    * `maxHam < bands` MUST agree on some band (pigeonhole), so recall is 1,
    * and the `bit_count(xor)` verify makes precision 1: the output is
    * EXACTLY the ≤-maxHam pair set, deterministically, at band-join cost.
    * The band value is the shuffle key at scale; a degenerate corpus of
    * near-identical images concentrates a band bucket exactly like a hot
    * LSH bucket (cap upstream if that is a real risk — see
    * [[graft.streaming.IncrementalLsh]]'s DF cap).
    *
    * @param hashes (doc_id, ahash) rows
    * @return (a_id, b_id, ham), a_id < b_id */
  def ahashPairs(hashes: DataFrame, maxHam: Int, bands: Int = 8): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHam >= 0 && maxHam < bands,
      s"pigeonhole recall needs maxHam < bands, got $maxHam/$bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sliced = hashes.select(col("doc_id"), col("ahash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * width).bitwiseAND(lit(mask)).as("bv"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.bv").as("bv"))
    sliced.as("x").join(sliced.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).cast("long").as("ham"))
      // verify BEFORE the dedup exchange: moderately-similar images that
      // collide on one band but fail ham <= maxHam are the bulk of the
      // candidate set, and shuffling them into distinct() just to drop them
      // would pay the exchange for rows the filter already rejects
      .filter(col("ham") <= maxHam)
      .distinct()
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

  /** Encode a real canonical PCM WAV: 44-byte RIFF header (RIFF/WAVE, 16-byte
    * `fmt ` chunk with audioFormat=1, then the `data` chunk) followed by
    * interleaved little-endian 16-bit samples — the public layout every
    * audio tool reads. `sample(i, ch)` returns sample i of channel ch. */
  def encodeWav(channels: Int, sampleRate: Int, nSamples: Int,
      sample: (Int, Int) => Short): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0,
      s"bad wav shape: $channels ch, $sampleRate Hz, $nSamples samples")
    val dataSize = nSamples * channels * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) { b.putShort(sample(i, c)); c += 1 }
      i += 1
    }
    b.array()
  }

  /** Real canonical-WAV header parse: (channels, sampleRate, bitsPerSample,
    * nSamples). Canonical layout only (fmt chunk first, data chunk at offset
    * 36) — WAVs with extra chunks (LIST/fact) fall back to the stub path, the
    * same honest posture as non-BMP images. The data-size field is validated
    * against the actual buffer so arbitrary bytes can't masquerade as audio. */
  def decodeWavMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    if (bytes.length < 44) None
    else {
      val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int, s: String): Boolean =
        (0 until 4).forall(i => bytes(off + i) == s.charAt(i).toByte)
      val shapeOk = tag(0, "RIFF") && tag(8, "WAVE") && tag(12, "fmt ") &&
        b.getInt(16) == 16 && b.getShort(20) == 1 && tag(36, "data")
      if (!shapeOk) None
      else {
        val channels = b.getShort(22).toInt
        val rate = b.getInt(24)
        val bits = b.getShort(34).toInt
        val dataSize = b.getInt(40)
        val blockAlign = channels * bits / 8
        val ok = channels > 0 && rate > 0 && bits % 8 == 0 && bits > 0 &&
          dataSize >= 0 && 44L + dataSize <= bytes.length && blockAlign > 0 &&
          dataSize % blockAlign == 0
        if (ok) Some((channels, rate, bits, dataSize.toLong / blockAlign)) else None
      }
    }

  final case class DecimatedAudio(doc_id: Long, channels: Int,
      sample_rate: Int, n_samples: Long, media: Array[Byte])

  /** Every-k-th-frame decimation — the audio twin of [[resize]]'s real
    * path: canonical 16-bit PCM WAV decodes for REAL (sample frames at
    * indexes 0, k, 2k, … survive, all channels interleaved; the output is a
    * re-encoded canonical WAV at rate/k), everything else takes a
    * deterministic STUB (every k-th byte). Pure integer arithmetic
    * end-to-end: kept-frame count is ceil(n/k) by integer division and
    * samples are copied bit-for-bit, so the full decode→decimate→re-encode
    * round trip is oracle-checkable. (Naive decimation aliases above the new
    * Nyquist rate — a production resampler low-passes first; the frame
    * selection and re-encode plumbing here is what the operator contract
    * pins, and a filter would slot into the same per-partition loop.) */
  def decimateWav(df: DataFrame, k: Int): Dataset[DecimatedAudio] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeWavMeta(bytes) match {
            case Some((ch, rate, 16, ns)) =>
              val b = java.nio.ByteBuffer.wrap(bytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val nk = ((ns + k - 1) / k).toInt
              val outRate = math.max(1, rate / k)
              val out = encodeWav(ch, outRate, nk,
                (j, c) => b.getShort(44 + ((j.toLong * k * ch + c) * 2).toInt))
              DecimatedAudio(id, ch, outRate, nk.toLong, out)
            case _ =>
              // STUB: every k-th raw byte; metadata mirrors the fake/pcm8
              // posture of decodeAudioMeta
              val kept = Array.tabulate((bytes.length + k - 1) / k)(i => bytes(i * k))
              DecimatedAudio(id, 1, math.max(1, 8000 / k), kept.length.toLong, kept)
          }
        }
      }
  }

  final case class WavStats(doc_id: Long, channels: Int, sample_rate: Int,
      n_samples: Long, n_bytes: Long, smp_sum: Long)

  /** Exact sample checksum of a canonical 16-bit PCM WAV column: decode
    * every sample of every channel and sum — the verification tail proving
    * an audio transform preserved actual sample data, not just headers.
    * Non-WAV rows are dropped (this is a WAV verifier). */
  def wavSampleStats(df: DataFrame): Dataset[WavStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeWavMeta(bytes).collect { case (ch, rate, 16, ns) =>
            val b = java.nio.ByteBuffer.wrap(bytes)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var s = 0L
            var i = 0
            val total = (ns * ch).toInt
            while (i < total) { s += b.getShort(44 + i * 2); i += 1 }
            WavStats(id, ch, rate, ns, bytes.length.toLong, s)
          }
        }
      }
  }

  final case class AudioMeta(doc_id: Long, n_bytes: Long, channels: Int,
      sample_rate: Int, bits: Int, n_samples: Long, duration_ms: Long,
      fmt: String)

  /** Partition-batched audio metadata decode — the audio twin of
    * [[decodeMeta]]: canonical PCM WAV parses for REAL (`audio/wav`);
    * anything else takes the deterministic stub (`fake/pcm8`: 1×8 kHz×8-bit,
    * every byte a sample). */
  def decodeAudioMeta(df: DataFrame): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          decodeWavMeta(bytes) match {
            case Some((ch, rate, bits, ns)) =>
              AudioMeta(id, n, ch, rate, bits, ns, ns * 1000L / rate, "audio/wav")
            case None =>
              AudioMeta(id, n, 1, 8000, 8, n, n * 1000L / 8000, "fake/pcm8")
          }
        }
      }
  }
}

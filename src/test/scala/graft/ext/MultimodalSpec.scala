package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes

/** Multimodal plumbing: binary column round-trip + partition-batched stub
  * decode determinism. */
class MultimodalSpec extends SparkSpec {

  test("stub decode is deterministic over the binary column") {
    val docs = Envelopes.table(spark, sfDir(), "documents").limit(50)
    val meta = Multimodal.decodeMeta(Multimodal.withFakeMedia(docs)).collect()
    assert(meta.length == 50)
    meta.foreach { m =>
      assert(m.width == 64 + m.n_bytes % 512)
      assert(m.height == 64 + (m.n_bytes * 7) % 512)
      assert(m.fmt == "fake/rgb8")
      assert(m.n_bytes > 0)
    }
    // schema is the typed contract a real decoder must keep
    val cols = Multimodal.decodeMeta(Multimodal.withFakeMedia(docs)).toDF().columns.toSeq
    assert(cols == Seq("doc_id", "n_bytes", "width", "height", "fmt"))
  }

  test("BMP media decodes for REAL: exact dimensions from the pixel bytes") {
    val s = spark
    import s.implicits._
    // genuine BMP bytes with dims derived from doc_id; pixels from the id too
    val docs = (0L until 24L).toDF("doc_id")
      .as[Long].map { id =>
        val (w, h) = (16 + (id % 10).toInt, 8 + (id % 5).toInt)
        (id, Multimodal.encodeBmp(w, h, (x, y) => (x * 31 + y * 7 + id.toInt) & 0xffffff))
      }.toDF("doc_id", "media")
    val meta = Multimodal.decodeMeta(docs).collect()
    assert(meta.length == 24)
    meta.foreach { m =>
      assert(m.fmt == "image/bmp", s"doc ${m.doc_id} fell back to the stub")
      assert(m.width == 16 + m.doc_id % 10, s"doc ${m.doc_id} width ${m.width}")
      assert(m.height == 8 + m.doc_id % 5, s"doc ${m.doc_id} height ${m.height}")
      // byte size matches the real layout: 54-byte header + padded BGR rows
      val stride = (m.width.toInt * 3 + 3) & ~3
      assert(m.n_bytes == 54 + stride * m.height)
    }
    // round-trip sanity at the parser level, including 4-byte row padding
    val enc = Multimodal.encodeBmp(3, 2, (_, _) => 0xabcdef)
    assert(Multimodal.decodeBmpDims(enc).contains((3L, 2L, 24)))
    // arbitrary text starting with "BM" must NOT be mistaken for an image
    val fake = ("BM" + "x" * 100).getBytes("UTF-8")
    assert(Multimodal.decodeBmpDims(fake).isEmpty)
  }

  test("BMP resize is REAL: NN-remapped pixels survive the re-encode round trip") {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).toDF("doc_id")
      .as[Long].map { id =>
        val (w, h) = (16 + (id % 10).toInt, 8 + (id % 5).toInt)
        (id, Multimodal.encodeBmp(w, h, (x, y) => (x * 31 + y * 7 + id.toInt) & 0xffffff))
      }.toDF("doc_id", "media")
    val out = Multimodal.resize(docs, 12, 6).collect()
    assert(out.length == 24)
    out.foreach { r =>
      val id = r.doc_id
      val (w0, h0) = (16 + (id % 10).toInt, 8 + (id % 5).toInt)
      val (w, h) = Multimodal.fitBox(w0, h0, 12, 6)
      assert((r.width, r.height) == ((w.toLong, h.toLong)))
      // decode the RESIZED bytes: every pixel must equal the source pixel
      // at the integer-floor NN index — real pixels, not just headers
      val Some((dw, dh, px)) = Multimodal.decodeBmp24(r.media)
      assert((dw, dh) == ((w, h)))
      for (x <- 0 until w; y <- 0 until h)
        assert(px(x, y) ==
          ((((x * w0) / w) * 31 + ((y * h0) / h) * 7 + id.toInt) & 0xffffff))
    }
    // aspect preserved within integer floor: a tall box binds on height
    assert(Multimodal.fitBox(16, 8, 12, 6) == ((12, 6)))
    assert(Multimodal.fitBox(25, 8, 12, 6) == ((12, 3)))
    assert(Multimodal.fitBox(4, 4, 12, 6) == ((4, 4))) // already fits: no-op
  }

  test("resize respects the bounding box; frame sampling keeps every k-th frame") {
    val docs = Multimodal.withFakeMedia(
      graft.model.Envelopes.table(spark, sfDir(), "documents").limit(20))
    val resized = Multimodal.resize(docs, 128, 128).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.width <= 128 && r.height <= 128 && r.width >= 1 && r.height >= 1)
      assert(r.media.nonEmpty)
    }
    val frames = Multimodal.sampleFrames(docs, everyK = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    // sampling rate: roughly a quarter of the windows survive
    val total = docs.collect().map(r =>
      (r.getAs[Array[Byte]]("media").length + 15) / 16).sum
    assert(frames.length <= total / 4 + 20)
  }

  test("WAV decimation is REAL: kept frames survive the re-encode bit-for-bit") {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).toDF("doc_id").as[Long].map { id =>
      val ch = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val ns = 100 + (id % 50).toInt
      (id, Multimodal.encodeWav(ch, rate, ns,
        (i, c) => ((i * ch + c + id) % 32768).toShort))
    }.toDF("doc_id", "media")
    val out = Multimodal.decimateWav(docs, 4).collect()
    assert(out.length == 24)
    out.foreach { r =>
      val id = r.doc_id
      val ch = 1 + (id % 2).toInt
      val ns = 100 + (id % 50).toInt
      assert(r.channels == ch)
      assert(r.sample_rate == 8000 * (1 + (id % 3).toInt) / 4)
      assert(r.n_samples == (ns + 3) / 4)
      // decode the DECIMATED bytes: frame j must equal source frame 4j on
      // every channel — real samples, not just a rewritten header
      val Some((dch, drate, 16, dns)) = Multimodal.decodeWavMeta(r.media)
      assert((dch, drate, dns) == ((r.channels, r.sample_rate, r.n_samples)))
      val b = java.nio.ByteBuffer.wrap(r.media)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      for (j <- 0 until dns.toInt; c <- 0 until ch)
        assert(b.getShort(44 + (j * ch + c) * 2) ==
          ((j * 4 * ch + c + id) % 32768).toShort)
    }
    // stub path: non-WAV bytes keep every 4th byte
    val stubIn = Multimodal.withFakeMedia(
      Envelopes.table(spark, sfDir(), "documents").limit(3))
    Multimodal.decimateWav(stubIn, 4).collect().zip(stubIn.collect()).foreach {
      case (dec, src) =>
        val raw = src.getAs[Array[Byte]]("media")
        assert(dec.media.toSeq == raw.indices.collect {
          case i if i % 4 == 0 => raw(i) }.toSeq)
    }
  }

  test("WAV media decodes for REAL; non-WAV bytes take the stub path") {
    val s = spark
    import s.implicits._
    val docs = (0L until 24L).toDF("doc_id").as[Long].map { id =>
      val ch = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 3).toInt)
      val ns = 100 + (id % 50).toInt
      (id, Multimodal.encodeWav(ch, rate, ns, (i, c) => ((i + c + id) % 100).toShort))
    }.toDF("doc_id", "media")
    val meta = Multimodal.decodeAudioMeta(docs).collect()
    assert(meta.length == 24)
    meta.foreach { m =>
      assert(m.fmt == "audio/wav", s"doc ${m.doc_id} fell back to the stub")
      assert(m.channels == 1 + m.doc_id % 2)
      assert(m.sample_rate == 8000 * (1 + m.doc_id % 3))
      assert(m.bits == 16)
      assert(m.n_samples == 100 + m.doc_id % 50)
      assert(m.n_bytes == 44 + m.n_samples * m.channels * 2)
      assert(m.duration_ms == m.n_samples * 1000 / m.sample_rate)
    }
    // parser-level: exact round trip, and hostile bytes must not parse
    val enc = Multimodal.encodeWav(2, 44100, 7, (_, _) => 5)
    assert(Multimodal.decodeWavMeta(enc).contains((2, 44100, 16, 7L)))
    // truncated data section: header promises more bytes than exist
    assert(Multimodal.decodeWavMeta(enc.take(50)).isEmpty)
    // text that merely starts with RIFF
    assert(Multimodal.decodeWavMeta(("RIFF" + "x" * 60).getBytes("UTF-8")).isEmpty)
    // stub path: fake media bytes are pretend 8-bit mono PCM
    val stub = Multimodal.decodeAudioMeta(
      Multimodal.withFakeMedia(Envelopes.table(spark, sfDir(), "documents").limit(5)))
      .collect()
    stub.foreach { m =>
      assert(m.fmt == "fake/pcm8" && m.channels == 1 && m.sample_rate == 8000
        && m.n_samples == m.n_bytes)
    }
  }

  test("aHash: block bits computed exactly; banded pairs = exact Hamming filter") {
    val s = spark
    import s.implicits._
    // one image per pattern: 16×16, 2×2 blocks, white/black per bit — the
    // hash must equal the pattern (any black block makes every white block
    // beat the global mean, see the contrast argument in q_mm_ahash)
    def img(pattern: Long) = Multimodal.encodeBmp(16, 16, (x, y) =>
      if ((pattern >> ((y / 2) * 8 + (x / 2)) & 1L) == 1L) 0xffffff else 0)
    val patterns = Seq(
      1L -> 0x0123456789abcdefL,
      2L -> 0x0123456789abcdeeL, // ham 1 vs doc 1
      3L -> 0xfedcba9876543210L, // complement-ish: far from 1 and 2
      4L -> 0x0123456789abc0efL) // ham 3 vs doc 1 (bits 8..11 region)
    val media = patterns.map { case (id, p) => (id, img(p)) }.toDF("doc_id", "media")
    val hashes = Multimodal.bmpAHash(media).collect().map(h => h.doc_id -> h.ahash).toMap
    assert(hashes == patterns.toMap, s"$hashes")
    // banded pairs at maxHam 3 = the brute-force Hamming-≤3 pair set
    val got = Multimodal.ahashPairs(Multimodal.bmpAHash(media).toDF(), maxHam = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = (for {
      (a, pa) <- patterns; (b, pb) <- patterns if a < b
      ham = java.lang.Long.bitCount(pa ^ pb) if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    assert(got == brute && got.contains((1L, 2L, 1L)) && got.contains((1L, 4L, 3L)),
      s"got $got expected $brute")
    // the pigeonhole contract is enforced, not assumed
    intercept[IllegalArgumentException] {
      Multimodal.ahashPairs(media.select(col("doc_id"), lit(0L).as("ahash")),
        maxHam = 8, bands = 8)
    }
  }
}

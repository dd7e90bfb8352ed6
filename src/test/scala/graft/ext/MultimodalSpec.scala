package graft.ext

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
}

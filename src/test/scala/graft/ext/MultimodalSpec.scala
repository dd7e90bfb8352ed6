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
}

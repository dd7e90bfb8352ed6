package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

/** K3/K4 — keyed upsert store across micro-batches: last write wins, deletes
  * tombstone keys, and final state is independent of batch boundaries (a
  * late-arriving LOWER-seq put must not resurrect a deleted key). */
class KeyedStoreSpec extends SparkSpec {

  test("multi-batch merge applies put/delete semantics in version order") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("keyedstore").toString + "/t"

    def active(): Map[String, (String, Long)] =
      KeyedStore.readActive(s, dir, opCol = "op").get.collect()
        .map(r => r.getAs[String]("k") -> ((r.getAs[String]("v"), r.getAs[Long]("seq"))))
        .toMap

    // batch 1: two puts + an older duplicate of k1 that must lose
    KeyedStore.merge(
      Seq(("k1", "v1", 10L, "put"), ("k2", "v2", 10L, "put"), ("k1", "v0", 5L, "put"))
        .toDF("k", "v", "seq", "op"),
      dir, keys = Seq("k"), seqCols = Seq("seq"))
    assert(active() == Map("k1" -> (("v1", 10L)), "k2" -> (("v2", 10L))))

    // batch 2: update k1, delete k2
    KeyedStore.merge(
      Seq(("k1", "v9", 20L, "put"), ("k2", "x", 20L, "delete")).toDF("k", "v", "seq", "op"),
      dir, keys = Seq("k"), seqCols = Seq("seq"))
    assert(active() == Map("k1" -> (("v9", 20L))))

    // batch 3: LATE put for k2 below the tombstone's seq — must stay deleted
    // (would wrongly resurrect if tombstones were physically dropped)
    KeyedStore.merge(
      Seq(("k2", "late", 15L, "put")).toDF("k", "v", "seq", "op"),
      dir, keys = Seq("k"), seqCols = Seq("seq"))
    assert(active() == Map("k1" -> (("v9", 20L))))

    // batch 4: re-insert k2 above the tombstone — resurrects
    KeyedStore.merge(
      Seq(("k2", "vNew", 30L, "put")).toDF("k", "v", "seq", "op"),
      dir, keys = Seq("k"), seqCols = Seq("seq"))
    assert(active() == Map("k1" -> (("v9", 20L)), "k2" -> (("vNew", 30L))))
  }
}

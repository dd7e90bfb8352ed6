package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Right-to-erasure through the WHOLE dedup chain in one pass — the
  * production GDPR shape the three per-store deletes exist for: a crawl
  * accepts documents through exact dedup → near-dup LSH → cluster
  * labeling; an erasure request must remove a document from ALL THREE
  * stores so (a) its exact bytes read as never-seen, (b) its near-dups
  * pass the signature screen, and (c) its cluster labels repair (splits,
  * keeper moves). The re-crawled replacement then flows back through the
  * same chain and is accepted. Each store's semantics are pinned by its
  * own spec; this one pins the COMPOSITION. */
class ChainErasureSpec extends SparkSpec {

  private def fp = graft.ext.TextStats.fingerprint(col("text"))
  // 12 distinct tokens; a one-token tail change is a near-dup at the
  // 1/2 threshold (the IncrementalLshSpec fixture)
  private def text(prefix: String, tail: String): String =
    (1 to 11).map(i => s"${prefix}_w$i").mkString(" ") + " " + tail

  test("erase a doc from all three stores; its near-dup re-crawl is accepted and re-clusters") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("chain_erase").toString
    val (fpStore, lshStore, ccStore) =
      (s"$root/fp", s"$root/lsh", s"$root/cc")

    def ingest(batch: org.apache.spark.sql.DataFrame,
        batchId: Long): Set[Long] = {
      // the chain: exact screen -> near-dup screen -> cluster the pairs
      // the accepted docs form with the stored corpus (here: within-batch
      // pairs only, the composition detail under test is erasure)
      val exact = IncrementalDedup.dedupBatch(batch, fpStore, fp,
        col("doc_id"), batchId)
      val accepted = IncrementalLsh.dedupBatch(exact, lshStore,
        col("doc_id"), col("text"), batchId)
      accepted.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    }

    // batch 0: doc 1 ("alpha"), doc 5 (a NEAR-dup of alpha — rejected by
    // LSH, so only doc 1 is indexed), doc 3 (unrelated)
    val accepted0 = ingest(Seq(
      (1L, text("alpha", "alpha_w12")),
      (5L, text("alpha", "alpha_x12")),
      (3L, text("beta", "beta_w12"))).toDF("doc_id", "text"), 0L)
    assert(accepted0 == Set(1L, 3L), s"got $accepted0")
    // cluster store: the near-dup pair (1, 5) the screen surfaced (a
    // production pipeline folds the pairs it rejects on)
    IncrementalCc.mergePairs(Seq((1L, 5L)).toDF("a_id", "b_id"), ccStore)
      .count()

    // ERASURE REQUEST for doc 1 ("alpha"): ONE composite call erases all
    // three stores (round 15 — callers no longer hand-sequence the ops)
    val erased = ChainErasure.eraseDocuments(
      Seq((1L, text("alpha", "alpha_w12"))).toDF("doc_id", "text"),
      fpStore, lshStore, ccStore,
      // surviving pairs among the affected cluster: none (the only pair
      // involved the erased doc)
      survivingPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id"),
      batchId = 1L)
    assert(erased.fingerprints == 1L && erased.signatures == 1L)
    val labels = erased.labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 5 was clustered under keeper 1; the erasure makes it a singleton
    assert(labels == Map(5L -> 5L), s"got $labels")
    // a REPLAY of the whole composite (crash-recovery) no-ops cleanly:
    // each store's HWM/idempotence absorbs its half
    val replay = ChainErasure.eraseDocuments(
      Seq((1L, text("alpha", "alpha_w12"))).toDF("doc_id", "text"),
      fpStore, lshStore, ccStore,
      survivingPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id"),
      batchId = 1L)
    assert(replay.fingerprints == 1L && replay.signatures == 1L)
    assert(replay.labels.collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap == Map(5L -> 5L))

    // the RE-CRAWL: doc 9 carries the exact erased bytes, doc 10 a
    // near-dup of them — both pass every screen (the chain no longer
    // remembers "alpha" in any store), while doc 11 re-sends the still-
    // indexed "beta" text and is rejected by the exact screen
    val accepted2 = ingest(Seq(
      (9L, text("alpha", "alpha_w12")),
      (11L, text("beta", "beta_w12"))).toDF("doc_id", "text"), 2L)
    assert(accepted2 == Set(9L), s"got $accepted2")
    val accepted3 = ingest(Seq(
      (10L, text("alpha", "alpha_y12"))).toDF("doc_id", "text"), 3L)
    // 10 is a near-dup of the RE-ACCEPTED 9 — rejected again, proving
    // the chain re-learned the content after erasure
    assert(accepted3 == Set.empty, s"got $accepted3")
    // and the label store can fold the new pair the screen surfaced
    val labels2 = IncrementalCc.mergePairs(
      Seq((9L, 10L)).toDF("a_id", "b_id"), ccStore)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels2 == Map(5L -> 5L, 9L -> 9L, 10L -> 9L), s"got $labels2")

    // NON-DEFAULT column names: the composite renames the pre-image to
    // (doc_id, text) internally, and the default fingerprint must resolve
    // against the RENAMED frame (a defaulted-fp erase of doc 9's bytes
    // delivered under CDC envelope names) — the self-review r15 fix
    val erased2 = ChainErasure.eraseDocuments(
      Seq((9L, text("alpha", "alpha_w12"))).toDF("id", "body"),
      fpStore, lshStore, ccStore,
      survivingPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id"),
      batchId = 4L, idCol = col("id"), textCol = col("body"))
    assert(erased2.fingerprints == 1L && erased2.signatures == 1L)
  }

  test("wiring a chunk store into the composite erases it in the same pass") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("chain_erase4").toString
    val (fpStore, lshStore, ccStore, chStore) =
      (s"$root/fp", s"$root/lsh", s"$root/cc", s"$root/ch")
    val b = Seq((1L, text("gamma", "gamma_w12"))).toDF("doc_id", "text")
    IncrementalDedup.dedupBatch(b, fpStore, fp, col("doc_id"), 0L).count()
    IncrementalLsh.dedupBatch(b, lshStore, col("doc_id"), col("text"), 0L)
      .count()
    IncrementalChunkDedup.dedupBatch(b, chStore, col("doc_id"), col("text"),
      0L).count()
    IncrementalCc.mergePairs(Seq((1L, 2L)).toDF("a_id", "b_id"), ccStore)
      .count()
    val erased = ChainErasure.eraseDocuments(b, fpStore, lshStore, ccStore,
      survivingPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id"),
      batchId = 1L, chunkStore = Some(chStore))
    // sole holder: every chunk reference was the last one — all reclaimed,
    // and the store's live view is empty
    assert(erased.fingerprints == 1L && erased.signatures == 1L &&
      erased.chunks > 0L)
    assert(KeyedStore.readActive(s, chStore).forall(_.isEmpty))
    // the default (no chunk store) path reports 0 without touching one
    assert(erased.labels.collect().map(_.getLong(0)).toSet == Set(2L))
  }
}

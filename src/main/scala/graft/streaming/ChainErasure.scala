package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-erasure through the WHOLE dedup chain in ONE call — the
  * production composite over the three per-store deletes
  * ([[IncrementalDedup.deleteBatch]] → [[IncrementalLsh.deleteBatch]] →
  * [[IncrementalCc.deleteNodes]]). A crawl pipeline accepts documents
  * through exact dedup → near-dup LSH → cluster labeling; an erasure
  * request must remove a document from ALL THREE stores so (a) its exact
  * bytes read as never-seen, (b) its near-dups pass the signature screen,
  * and (c) its cluster labels repair (splits, keeper moves). Before this
  * wrapper, callers sequenced the three ops by hand and could miss a
  * store or invert the ordering contract below (VERDICT r14 item 4).
  *
  * ORDERING CONTRACT (the reason this op takes full rows, not ids): the
  * LSH delete RECOMPUTES band keys from the text — minhash purity means
  * recomputation reaches exactly the original fold's keys — so the dedup
  * chain must be erased while the original text is still available,
  * i.e. BEFORE the corpus store drops the document bytes. A CDC delete
  * envelope carries the full pre-image row, which is exactly this shape.
  * Erasing from the corpus first strands the chain: the LSH guard then
  * hard-fails on the missing/drifted text.
  *
  * Replay safety composes from the parts: each store delete rides its own
  * manifest-note high-water mark (same `batchId` across all three), and
  * the CC delete is idempotent set-removal — so a crash between stores
  * replays clean: already-erased stores no-op, the rest proceed. Per-doc
  * coverage differences are legal and handled per store: a doc too short
  * to shingle has no LSH rows (no-op there), a doc never clustered has no
  * label (CC skips it silently). The "erase accepted documents only"
  * guards compose: the batch must be docs the CHAIN accepted end-to-end
  * (the ones a corpus store retains) — a doc the LSH screen rejected has
  * a lingering exact fingerprint but no signature rows, and erasing it
  * here trips the LSH guard by design (its accepted twin owns the
  * signature; erase the twin, not the rejected copy).
  *
  * Scale posture is the three ops': every store read is bucket-pruned by
  * the batch's keys (O(batch) file IO at any store size), merges rewrite
  * only touched buckets, and tombstones compact on the
  * [[KeyedStore.maintain]] cadence. `survivingPairs` is the caller's pair
  * source restricted (or restrictable — a superset is filtered inside
  * [[IncrementalCc.deleteNodes]] to affected clusters) to pairs with both
  * endpoints surviving, re-derived exactly like
  * [[IncrementalIvf.reclusterRebuild]] takes surviving vectors.
  */
object ChainErasure {

  /** What one erasure pass removed: exact fingerprints, LSH-indexed
    * documents, the post-repair label table (a LAZY store read — callers
    * that outlive or delete the store checkpoint it), and — when a chunk
    * store was passed — the reclaimable chunk fingerprints (references
    * whose count reached zero; shared chunks survive at decremented
    * counts). */
  final case class Erased(fingerprints: Long, signatures: Long,
      labels: DataFrame, chunks: Long = 0L)

  /** Erase `batch`'s documents ((id, text) rows — the CDC delete
    * pre-image) from the fingerprint store, the LSH signature index, and
    * the cluster label store, repairing affected clusters from
    * `survivingPairs`.
    *
    * @param fpCol  fingerprint expression, resolved against the RENAMED
    *               pre-image (columns `doc_id`, `text` — not the batch's
    *               original names); None = the chain default,
    *               [[graft.ext.TextStats.fingerprint]] over `text`
    *               (must match what the ingest chain used)
    * @param k, bands  the LSH parameters the ingest chain indexed with
    * @param survivingPairs  (a_id, b_id) pairs among SURVIVING docs from
    *               the caller's pair source; a superset is fine
    * @param chunkStore  optional [[IncrementalChunkDedup]] root: when the
    *               pipeline also runs content-defined chunk storage, the
    *               same pass decrements the erased docs' chunk references
    *               and reports the reclaimable (last-reference) set —
    *               erasure everywhere, one call */
  def eraseDocuments(batch: DataFrame, fpStore: String, lshStore: String,
      ccStore: String, survivingPairs: DataFrame, batchId: Long,
      idCol: Column = col("doc_id"), textCol: Column = col("text"),
      fpCol: Option[Column] = None, k: Int = 32, bands: Int = 16,
      numBuckets: Int = 16, ccNumBuckets: Int = 4,
      chunkStore: Option[String] = None): Erased = {
    // the default fingerprint resolves against the RENAMED pre-image:
    // deriving it from `textCol` would carry the batch's original column
    // name into selects over `rows`, which only has doc_id/text
    val fp = fpCol.getOrElse(graft.ext.TextStats.fingerprint(col("text")))
    // the CDC pre-image feeds three derivations — pin it once (LAZY: the
    // first store's probe collect materializes it)
    val rows = batch.select(idCol.as("doc_id"), textCol.as("text"))
      .localCheckpoint(false)
    val nFp = IncrementalDedup.deleteBatch(rows, fpStore, fp, batchId,
      numBuckets)
    val nSig = IncrementalLsh.deleteBatch(rows, lshStore, col("doc_id"),
      col("text"), batchId, k, bands, numBuckets)
    val labels = IncrementalCc.deleteNodes(rows.select(col("doc_id")),
      survivingPairs, ccStore, ccNumBuckets)
    val nChunks = chunkStore.map(IncrementalChunkDedup.deleteBatch(
      rows, _, col("doc_id"), col("text"), batchId,
      numBuckets = numBuckets)).getOrElse(0L)
    graft.util.Blocks.freeCheckpoint(rows)
    Erased(nFp, nSig, labels, nChunks)
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Tombstone growth bound on the deletion stores (round 14, VERDICT r13
  * item 6): a delete-heavy stream must keep store READS O(live), not
  * O(live + every delete ever) — the delete paths wire
  * [[KeyedStore.maintain]] (gen-cadenced tombstone compaction), and this
  * spec MEASURES the bound: after N fold+delete cycles the stored row
  * count (tombstones included — what every pruned read scans) stays a
  * small multiple of the live rows instead of the delete history. */
class DeleteCompactionSpec extends SparkSpec {

  test("IncrementalDf: stored rows stay O(live terms) across many delete folds") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("df_comp").toString + "/df"
    val nBatches = 20
    def batch(i: Int) = (0 until 3)
      .map(j => (i * 10L + j, s"t${i}_$j u${i}_$j"))
      .toDF("doc_id", "text")
    for (i <- 0 until nBatches)
      IncrementalDf.mergeBatch(batch(i), store, col("doc_id"), col("text"),
        batchId = i.toLong)
    val rawAfterFolds = KeyedStore.read(s, store).get.count()
    // delete all but the last two batches, one fold per batch — the
    // delete history (18 folds × 6 term tombstones) would dwarf the
    // 12 surviving term rows without compaction
    for (i <- 0 until nBatches - 2)
      IncrementalDf.deleteBatch(batch(i), store, col("doc_id"), col("text"),
        batchId = (nBatches + i).toLong)
    val rawAfterDeletes = KeyedStore.read(s, store).get.count()
    val liveTerms = KeyedStore.read(s, store).get
      .filter(col("kind") === "v" && col("op_type") =!= "delete").count()
    info(s"raw rows: $rawAfterFolds after folds, $rawAfterDeletes after " +
      s"deletes ($liveTerms live terms)")
    assert(liveTerms == 2 * 3 * 2, "two surviving batches x 3 docs x 2 terms")
    // the bound: without the maintain wiring the store would hold
    // 108 tombstones + 12 live terms + c/m rows (> 120 raw rows); the
    // cadence (gen % 16, tombstone fraction > 0.5) must have fired at
    // least once, so the raw count stays a small multiple of live
    assert(rawAfterDeletes < 70,
      s"$rawAfterDeletes raw rows after 18 delete folds — tombstones are " +
        "accumulating; the delete path lost its KeyedStore.maintain wiring")
    // and the surviving stats remain integer-exact (the deletion family's
    // core contract): 6 surviving docs, 2 tokens each
    val st = IncrementalDf.readStats(s, store).head()
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) == ((6L, 12L, 12L)),
      s"survivor stats drifted: $st")
  }

  test("IncrementalIvf: ids/codes stores shrink under the delete cadence; search stays exact") {
    val e = graft.model.Envelopes.table(spark, sfDir(), "embeddings")
      .localCheckpoint(true)
    val books = graft.ext.Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("ivf_comp").toString + "/ix"
    val nB = 10
    for (i <- 0 until nB)
      IncrementalIvf.mergeBatch(e.filter(col("vec_id") % nB === i), store,
        books, batchId = i.toLong)
    // delete 8 of the 10 slices, one fold each — ids gens reach the
    // % 16 cadence mid-way with tombstone fraction > 0.5
    for (i <- 0 until nB - 2)
      IncrementalIvf.deleteBatch(e.filter(col("vec_id") % nB === i), store,
        books, batchId = (nB + i).toLong)
    val total = e.count()
    val surv = e.filter(col("vec_id") % nB >= nB - 2)
    val idsRaw = KeyedStore.read(spark, s"$store/ids").get.count()
    val codesRaw = KeyedStore.read(spark, s"$store/codes").get.count()
    info(s"ids raw $idsRaw (live ${surv.count()}); codes raw $codesRaw " +
      s"(live ${surv.count() * 4})")
    // CODES compact on the cadence: without it the store would hold one
    // row per (vector EVER indexed × m) — live puts + delete tombstones
    assert(codesRaw < total * 4,
      s"codes store holds $codesRaw rows for ${surv.count() * 4} live codes")
    // the IDS store deliberately KEEPS its delete tombstones — they are
    // the deletion-drift gauge's memory (one row per id ever indexed);
    // compacting them would zero idLiveness and silently defeat
    // needsRecluster (the round-14 review's finding)
    assert(idsRaw == total,
      s"ids store holds $idsRaw rows — expected one per id ever indexed")
    val (live, dead) = IncrementalIvf.idLiveness(spark, store)
    assert(live == surv.count() && dead == total - surv.count(),
      s"drift gauge corrupted: ($live, $dead)")
    assert(IncrementalIvf.needsRecluster(spark, store),
      "80% deletion must still trip the gauge after the delete folds")
    // the compacted index still answers bit-exactly: search == the batch
    // chain over the survivors
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val got = IncrementalIvf.search(spark, store, qs, books, m = 4,
      topK = 5, nProbe = 2)
    val want = graft.ext.Similarity.ivfPqTopK(qs, surv, books,
      graft.ext.Similarity.pqEncode(surv, books, m = 4), m = 4, topK = 5,
      nProbe = 2)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "post-compaction search diverged from the batch chain over survivors")
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }
}

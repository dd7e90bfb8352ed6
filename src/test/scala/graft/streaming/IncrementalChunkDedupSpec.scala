package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextStats

/** Cross-batch chunk-level storage dedup: content-defined chunk layout
  * screened against a persistent fingerprint store — batch parity with the
  * one-shot operator, and the insertion-robustness property ACROSS batches
  * (a re-ingested document with an early edit stores only its touched
  * chunks). */
class IncrementalChunkDedupSpec extends SparkSpec {

  // long enough for ~8+ chunks at divisor=16 so robustness is measurable;
  // deterministic token stream
  private def words(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
  }

  test("fold across batches equals the batch operator over the concatenated corpus") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk").toString + "/store"
    val d1 = (1L, words(1, 300).mkString(" "))
    val d2 = (2L, words(2, 250).mkString(" "))
    val d3 = (3L, words(3, 280).mkString(" "))
    val d2re = (4L, d2._2) // exact re-ingest under a new id

    val b0 = Seq(d1, d2).toDF("doc_id", "text")
    val b1 = Seq(d3, d2re).toDF("doc_id", "text")
    val o0 = IncrementalChunkDedup.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
    val o1 = IncrementalChunkDedup.dedupBatch(b1, store, col("doc_id"), col("text"), 1L)

    // layout parity: chunk rows match the pure chunker on each batch
    val want0 = TextStats.cdcChunks(b0, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(o0.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet == want0)

    // store parity: persisted fps == distinct fps of the concatenated corpus
    val all = Seq(d1, d2, d3, d2re).toDF("doc_id", "text")
    val wantFps = TextStats.cdcChunks(all, col("doc_id"), col("text"))
      .select("fp").distinct().collect().map(_.getLong(0)).toSet
    val storeFps = KeyedStore.read(s, store).get
      .select("fp").collect().map(_.getLong(0)).toSet
    assert(storeFps == wantFps, s"store ${storeFps.size} vs want ${wantFps.size}")

    // stored flags: batch 0 stores every distinct fp once; the re-ingested
    // doc in batch 1 stores NOTHING (all its chunks are referenced)
    val stored1 = o1.filter(col("stored") === 1)
      .select("doc_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!stored1.exists(_._1 == 4L),
      s"exact re-ingest must store no chunks: ${stored1.filter(_._1 == 4L).length}")
    // batch-1 stored set == d3's fps minus what batch 0 already holds
    val fps0 = TextStats.cdcChunks(Seq(d1, d2).toDF("doc_id", "text"),
      col("doc_id"), col("text")).select("fp").collect().map(_.getLong(0)).toSet
    val fps3 = TextStats.cdcChunks(Seq(d3).toDF("doc_id", "text"),
      col("doc_id"), col("text")).select("fp").collect().map(_.getLong(0)).toSet
    assert(stored1.map(_._2).toSet == fps3.diff(fps0))
  }

  test("early insertion across batches stores only the touched chunks (CDC re-sync)") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_ins").toString + "/store"
    val base = words(7, 400)
    // insertion near the front: chunks after the edit point re-synchronize
    val edited = base.take(5) ++ Seq("inserted", "tokens", "here") ++ base.drop(5)

    val b0 = Seq((1L, base.mkString(" "))).toDF("doc_id", "text")
    IncrementalChunkDedup.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .count()
    val b1 = Seq((2L, edited.mkString(" "))).toDF("doc_id", "text")
    val o1 = IncrementalChunkDedup.dedupBatch(b1, store, col("doc_id"), col("text"), 1L)
      .collect()

    val total = o1.length
    val stored = o1.count(_.getInt(4) == 1)
    // exactness: stored set == the edited doc's fps the store lacked
    val fpsBase = TextStats.cdcChunks(b0, col("doc_id"), col("text"))
      .select("fp").collect().map(_.getLong(0)).toSet
    val wantNew = o1.map(_.getLong(3)).toSet.diff(fpsBase)
    assert(o1.filter(_.getInt(4) == 1).map(_.getLong(3)).toSet == wantNew)
    // robustness: the edit touches the boundary-local chunks only — the
    // vast majority of the re-ingested document is referenced, not stored
    assert(stored > 0, "an insertion must dirty at least one chunk")
    assert(stored <= math.max(3, total / 4),
      s"insertion should dirty O(1) chunks, stored $stored of $total")

    // a FIXED-STRIDE chunker has no re-sync: the same edit shifts every
    // downstream boundary, so its dirty-chunk count grows with doc length —
    // the contrast that motivates CDC for storage dedup
    def strideFps(toks: Seq[String], k: Int) =
      toks.grouped(k).map(_.mkString(" ")).toSet
    val strideDirty = strideFps(edited, 16).diff(strideFps(base, 16)).size
    assert(strideDirty > stored,
      s"fixed-stride dirties $strideDirty, CDC stored only $stored")
  }

  test("replayed batch re-marks its own chunks stored (at-least-once safety)") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_rp").toString + "/store"
    val b0 = Seq((1L, words(23, 250).mkString(" "))).toDF("doc_id", "text")
    val first = IncrementalChunkDedup
      .dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4))).toSet
    assert(first.exists(_._4 == 1))
    // crash-after-merge, re-delivery: the SAME batch id must get stored = 1
    // for its own fingerprints again, or the content bytes are never
    // written by any run
    val replay = IncrementalChunkDedup
      .dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getInt(4))).toSet
    assert(replay == first, "replay must be idempotent, not seen-suppressed")
    // a LATER batch with the same content is a plain duplicate: nothing new
    val b1 = Seq((2L, b0.head.getString(1))).toDF("doc_id", "text")
    val later = IncrementalChunkDedup
      .dedupBatch(b1, store, col("doc_id"), col("text"), 1L)
    assert(later.filter(col("stored") === 1).count() == 0L)
  }

  test("drives a foreachBatch stream end-to-end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val store = Files.createTempDirectory("inc_chunk_st").toString + "/store"
    val stored = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        IncrementalChunkDedup
          .dedupBatch(batch, store, col("doc_id"), col("text"), bid)
          .filter(col("stored") === 1).select("doc_id", "chunk_id")
          .collect().foreach(r => stored.add((r.getLong(0), r.getLong(1))))
        ()
      }
      .start()
    try {
      val t = words(31, 150).mkString(" ")
      mem.addData((1L, t)); q.processAllAvailable()
      val afterFirst = stored.size
      assert(afterFirst > 0)
      mem.addData((2L, t)); q.processAllAvailable() // exact re-ingest
      assert(stored.size == afterFirst, "re-ingest must store nothing")
    } finally q.stop()
  }

  test("deleteBatch: refcounts keep shared chunks alive; the last holder's erase reclaims") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_del").toString + "/store"
    val t1 = words(41, 300).mkString(" ")
    val b0 = Seq((1L, t1), (2L, t1)).toDF("doc_id", "text") // full sharers
    IncrementalChunkDedup.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .count()
    val nFps = KeyedStore.readActive(s, store).get.count()
    assert(nFps > 0)
    // every chunk is referenced twice
    assert(KeyedStore.readActive(s, store).get
      .agg(min(col("cnt"))).head().getLong(0) == 2L)
    // erasing ONE sharer reclaims NOTHING — doc 2 still references every
    // chunk; counts drop to 1
    assert(IncrementalChunkDedup.deleteBatch(
      Seq((1L, t1)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 1L) == 0L)
    assert(KeyedStore.readActive(s, store).get
      .agg(max(col("cnt")), count(lit(1))).head().toSeq == Seq(1L, nFps))
    // erasing the LAST holder reclaims every chunk
    assert(IncrementalChunkDedup.deleteBatch(
      Seq((2L, t1)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 2L) == nFps)
    // ... and a re-ingest of the erased content stores everything again
    val re = IncrementalChunkDedup.dedupBatch(
      Seq((9L, t1)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 3L)
    assert(re.filter(col("stored") === 1).count() == nFps)
  }

  test("deleteBatch: fold/delete interleaving equals the reference count over survivors") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_par").toString + "/store"
    val docs = Seq(
      (1L, words(51, 260).mkString(" ")), (2L, words(52, 220).mkString(" ")),
      (3L, words(53, 240).mkString(" ")), (4L, words(51, 260).mkString(" ")))
    IncrementalChunkDedup.dedupBatch(
      docs.take(2).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 0L).count()
    IncrementalChunkDedup.dedupBatch(
      docs.drop(2).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 1L).count()
    IncrementalChunkDedup.deleteBatch(
      docs.filter(_._1 == 1L).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 2L)
    val got = KeyedStore.readActive(s, store).get
      .select("fp", "cnt").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // oracle: one-pass chunk-reference count over the SURVIVING corpus
    val want = TextStats.cdcChunks(
        docs.filterNot(_._1 == 1L).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .groupBy("fp").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("deleteBatch: guards (never-folded, drifted text) and note-HWM replay") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_grd").toString + "/store"
    val t = words(61, 250).mkString(" ")
    IncrementalChunkDedup.dedupBatch(
      Seq((1L, t)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 0L).count()
    // a doc that was never folded aborts loudly (its chunks are missing)
    intercept[IllegalArgumentException] {
      IncrementalChunkDedup.deleteBatch(
        Seq((5L, words(62, 250).mkString(" "))).toDF("doc_id", "text"),
        store, col("doc_id"), col("text"), 1L)
    }
    // drifted text likewise (some recomputed chunk is unknown)
    intercept[IllegalArgumentException] {
      IncrementalChunkDedup.deleteBatch(
        Seq((1L, t + " drifted tail tokens")).toDF("doc_id", "text"),
        store, col("doc_id"), col("text"), 1L)
    }
    val n = IncrementalChunkDedup.deleteBatch(
      Seq((1L, t)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 1L)
    assert(n > 0L)
    // replay of the LATEST erase returns its recorded count, untouched
    val gen = KeyedStore.latestGeneration(s, store)
    assert(IncrementalChunkDedup.deleteBatch(
      Seq((1L, t)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 1L) == n)
    // a replayed OLDER batch id no-ops with 0
    assert(IncrementalChunkDedup.deleteBatch(
      Seq((1L, t)).toDF("doc_id", "text"), store,
      col("doc_id"), col("text"), 0L) == 0L)
    assert(KeyedStore.latestGeneration(s, store) == gen)
  }

  test("pre-r15 presence-layout store fails loudly with the rebuild instruction") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_old").toString + "/store"
    // the round-14 layout: one (fp, batch_id) presence row per stored
    // fingerprint, no op_type/cnt/fb, no layout stamp
    KeyedStore.merge(
      Seq((7L, 0L)).toDF("fp", "batch_id"), store,
      keys = Seq("fp"), seqCols = Seq("batch_id"), bucketCols = Seq("fp"))
    val e = intercept[IllegalStateException] {
      IncrementalChunkDedup.dedupBatch(
        Seq((1L, words(71, 250).mkString(" "))).toDF("doc_id", "text"),
        store, col("doc_id"), col("text"), 1L)
    }
    assert(e.getMessage.contains("chunk-rc-v1") &&
      e.getMessage.contains("Rebuild the store"), e.getMessage)
  }

  test("restart: a fresh caller over the same store keeps referencing") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_chunk_rs").toString + "/store"
    val d = (1L, words(11, 200).mkString(" "))
    val b0 = Seq(d).toDF("doc_id", "text")
    IncrementalChunkDedup.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .count()
    // "restart": same content, new caller, new id — everything referenced
    val b1 = Seq((9L, d._2)).toDF("doc_id", "text")
    val o1 = IncrementalChunkDedup.dedupBatch(b1, store, col("doc_id"), col("text"), 1L)
    assert(o1.filter(col("stored") === 1).count() == 0L)
    assert(o1.count() > 0L)
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-batch NEAR-dup rejection over the persistent signature store: a
  * re-phrased re-arrival (not byte-identical — one token differs) must be
  * rejected in a later batch, across callers, while genuinely new content
  * and unshingleable shorts pass. */
class IncrementalLshSpec extends SparkSpec {

  // 12 distinct tokens; a one-token tail change keeps 9 of 10 trigram
  // shingles (J = 9/11 ≈ 0.82) — a near-dup under the 1/2 threshold with a
  // comfortable signature-estimate margin
  private def text(prefix: String, tail: String): String =
    (1 to 11).map(i => s"${prefix}_w$i").mkString(" ") + " " + tail

  test("near-dup re-arrivals are rejected across batches and callers") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_lsh").toString + "/store"

    // batch 0: doc 1 and its one-token variant doc 2 (within-batch cluster,
    // min id kept), unrelated doc 3
    val b0 = Seq(
      (1L, text("alpha", "alpha_w12")),
      (2L, text("alpha", "alpha_x12")),
      (3L, text("beta", "beta_w12"))).toDF("doc_id", "text")
    val out0 = IncrementalLsh.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out0 == Set(1L, 3L), s"got $out0")

    // batch 1: doc 4 is ANOTHER variant of doc 1 (cross-batch near-dup —
    // never seen byte-identically), doc 5 is new content
    val b1 = Seq(
      (4L, text("alpha", "alpha_y12")),
      (5L, text("gamma", "gamma_w12"))).toDF("doc_id", "text")
    val out1 = IncrementalLsh.dedupBatch(b1, store, col("doc_id"), col("text"), 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out1 == Set(5L), s"got $out1")

    // "restart": a fresh caller over the same store still knows doc 3's
    // neighborhood; a short unshingleable doc passes the near-dup screens
    val b2 = Seq(
      (6L, text("beta", "beta_z12")),
      (7L, "tiny doc")).toDF("doc_id", "text")
    val out2 = IncrementalLsh.dedupBatch(b2, store, col("doc_id"), col("text"), 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out2 == Set(7L), s"got $out2")

    // the index holds signatures for exactly the accepted shingleable docs
    val indexed = KeyedStore.read(s, store).get
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 3L, 5L))
  }

  test("saturated band buckets are DF-capped out of the verify join") {
    val s = spark
    import s.implicits._
    import graft.ext.Dedup
    val cap = 8
    val doc = Seq((1L, text("stop", "stop_w12"))).toDF("doc_id", "text")
    // the doc's real band buckets and signature, via the same helpers
    // dedupBatch uses — the synthetic store rows below are schema-exact
    val sig = Dedup.minhashSignatures(
      Dedup.shingles(doc, col("doc_id"), col("text")))
    val sigArr = sig.select(col("doc_id"),
      array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
    val oneBucket = Dedup.bandBuckets(sig).limit(1)
    // saturate that ONE bucket: cap+1 stored docs, each a perfect signature
    // match (uncapped, any of them would reject the probe)
    def saturatedRows = oneBucket.join(sigArr.select(col("sig")))
      .crossJoin(s.range(100, 100 + cap + 1))
      .select(col("band"), col("bkey"), col("id").as("doc_id"),
        col("sig"), lit(0L).as("batch_id"), lit("put").as("op_type"))

    // capped: the hot bucket is excluded, every other band misses (empty
    // store there) — the doc is ACCEPTED
    val storeA = Files.createTempDirectory("inc_lsh_cap").toString + "/a"
    KeyedStore.merge(saturatedRows, storeA,
      keys = Seq("band", "bkey", "doc_id"), seqCols = Seq("batch_id"),
      bucketCols = Seq("band", "bkey"))
    val outA = IncrementalLsh.dedupBatch(doc, storeA, col("doc_id"),
        col("text"), 1L, maxBandDf = cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outA == Set(1L), s"capped screen must skip the saturated bucket, got $outA")

    // same store, cap wide enough to keep the bucket: the doc is REJECTED
    val storeB = Files.createTempDirectory("inc_lsh_cap").toString + "/b"
    KeyedStore.merge(saturatedRows, storeB,
      keys = Seq("band", "bkey", "doc_id"), seqCols = Seq("batch_id"),
      bucketCols = Seq("band", "bkey"))
    val outB = IncrementalLsh.dedupBatch(doc, storeB, col("doc_id"),
        col("text"), 1L, maxBandDf = cap + 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outB == Set.empty[Long], s"uncapped-width screen must reject, got $outB")

    // the cap bounds the verify candidate set itself: the saturated bucket
    // contributes 0 candidate rows capped vs cap+1 uncapped
    val stored = KeyedStore.read(s, storeB).get
      .select(col("band"), col("bkey"), col("sig").as("__ssig"))
    val probes = Dedup.bandBuckets(sig)
    val uncapped = probes.join(stored, Seq("band", "bkey")).count()
    val capped = probes.join(
      IncrementalLsh.cappedStored(stored, cap), Seq("band", "bkey")).count()
    assert(uncapped >= cap + 1 && capped <= uncapped - (cap + 1),
      s"expected the saturated bucket's $uncapped candidates capped away, got $capped")
  }

  test("deleteBatch: erased signatures stop screening their near-dups; guards hold") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_lsh_del").toString + "/store"
    val b0 = Seq(
      (1L, text("alpha", "alpha_w12")),
      (3L, text("beta", "beta_w12"))).toDF("doc_id", "text")
    assert(IncrementalLsh.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .count() == 2)
    // a near-dup variant of doc 1 is rejected pre-erasure
    val v = Seq((4L, text("alpha", "alpha_x12"))).toDF("doc_id", "text")
    assert(IncrementalLsh.dedupBatch(v, store, col("doc_id"), col("text"), 1L)
      .count() == 0)
    // erase doc 1 (CDC delete carries the full original row)
    assert(IncrementalLsh.deleteBatch(
      Seq((1L, text("alpha", "alpha_w12"))).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 2L) == 1L)
    // the SAME variant is now ACCEPTED — the index no longer remembers
    // the erased text through its signature
    assert(IncrementalLsh.dedupBatch(v, store, col("doc_id"), col("text"), 3L)
      .count() == 1)
    // erasing with drifted text (or a doc never accepted) aborts loudly
    val e = intercept[IllegalArgumentException] {
      IncrementalLsh.deleteBatch(
        Seq((3L, text("beta", "beta_DRIFTED"))).toDF("doc_id", "text"),
        store, col("doc_id"), col("text"), 4L)
    }
    assert(e.getMessage.contains("not"))
    // same-batchId replay of an erase is exempt and idempotent
    assert(IncrementalLsh.deleteBatch(
      Seq((4L, text("alpha", "alpha_x12"))).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 5L) == 1L)
    assert(IncrementalLsh.deleteBatch(
      Seq((4L, text("alpha", "alpha_x12"))).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 5L) == 1L)
    // a replay of an OLDER erase no-ops with 0 (single note slot: its own
    // count is unrecoverable, echoing the newest batch's would lie —
    // ADVICE r14); the store is untouched
    val genBefore = KeyedStore.latestGeneration(s, store)
    assert(IncrementalLsh.deleteBatch(
      Seq((1L, text("alpha", "alpha_w12"))).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 2L) == 0L)
    assert(KeyedStore.latestGeneration(s, store) == genBefore)
    // a doc too short to shingle erases as a no-op
    assert(IncrementalLsh.deleteBatch(
      Seq((7L, "too short")).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 6L) == 0L)
  }
}

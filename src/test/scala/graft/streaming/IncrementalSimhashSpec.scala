package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Cross-batch SimHash rejection: re-arrivals within the Hamming radius
  * are rejected against the persistent fingerprint store (zero false
  * negatives by pigeonhole), within-batch clusters keep their minimum,
  * the store survives restart, and token-less docs pass unstored. */
class IncrementalSimhashSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("re-arrivals reject across batches; within-batch keeps the minimum") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_sh").toString + "/store"
    val base = graft.model.Envelopes.table(s, sfDir(), "documents")
      .select(col("doc_id"), col("text")).limit(40).localCheckpoint(true)

    // batch 0: the base docs plus an in-batch EXACT duplicate of doc X
    // under a higher id — the duplicate must lose to the minimum
    val x = base.orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("text")).head()
    val dupId = 900000L
    val b0 = base.unionByName(
      Seq((dupId, x.getString(1))).toDF("doc_id", "text"))
    val a0 = IncrementalSimhash.dedupBatch(b0, store, col("doc_id"),
      col("text"), 0L)
    val got0 = ids(a0)
    assert(!got0.contains(dupId), "in-batch exact dup must lose")
    assert(got0.contains(x.getLong(0)))

    // batch 1: every ACCEPTED doc re-arrives under new ids (hamming 0
    // against the store — losers were never stored and carry no such
    // guarantee) plus one genuinely new doc
    val rearrived = a0.select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"))
    val fresh = Seq((2000000L,
      "completely novel zebra quantum flotilla discourse " +
        "unseen tokens everywhere xylophone")).toDF("doc_id", "text")
    val a1 = IncrementalSimhash.dedupBatch(rearrived.unionByName(fresh),
      store, col("doc_id"), col("text"), 1L)
    val got1 = ids(a1)
    assert(got1.contains(2000000L), "novel doc must pass")
    assert(!got1.exists(id => id >= 1000000L && id < 2000000L),
      s"all re-arrivals must reject: $got1")

    // crash replay of batch 1: the store already holds batch 1's
    // fingerprints, but the screen ignores rows at batch_id >= 1, so the
    // replay recomputes the IDENTICAL accepted set instead of rejecting
    // its own first attempt
    val a1r = IncrementalSimhash.dedupBatch(rearrived.unionByName(fresh),
      store, col("doc_id"), col("text"), 1L)
    assert(ids(a1r) == got1, "replay must reproduce the accepted set")
    graft.util.Blocks.freeCheckpoint(base)
  }

  test("null text passes unstored; empty strings form one hamming-0 cluster") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_sh_e").toString + "/store"
    val b = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "real tokens here three")).toDF("doc_id", "text")
    val a = IncrementalSimhash.dedupBatch(b, store, col("doc_id"),
      col("text"), 0L)
    assert(ids(a) == Set(1L, 2L, 3L))
    val a2 = IncrementalSimhash.dedupBatch(
      Seq((4L, null.asInstanceOf[String]), (5L, "")).toDF("doc_id", "text"),
      store, col("doc_id"), col("text"), 1L)
    // null text re-arrives freely (never fingerprinted, never stored);
    // the empty STRING hashes the empty token and rejects against doc 2
    assert(ids(a2) == Set(4L))
  }
}

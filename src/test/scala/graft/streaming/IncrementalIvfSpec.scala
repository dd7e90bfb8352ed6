package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Persistent IVFADC index: store-backed search == the batch operator over
  * concatenated history at every horizon (frozen books); replay safety;
  * the codes-then-stats crash window replays clean; the cell directory
  * tracks indexed counts. */
class IncrementalIvfSpec extends SparkSpec {

  private def emb = graft.model.Envelopes.table(spark, sfDir(), "embeddings")

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("search equals batch ivfPqTopK over concatenated history at every horizon") {
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val store = Files.createTempDirectory("inc_ivf").toString + "/ix"
    var hist: DataFrame = null
    for (i <- 0 until 3) {
      val b = e.filter(col("vec_id") % 3 === i)
      hist = if (hist == null) b else hist.unionByName(b)
      IncrementalIvf.mergeBatch(b, store, books, batchId = i.toLong)
      val got = IncrementalIvf.search(spark, store, qs, books, m = 4,
        topK = 5, nProbe = 2)
      val want = Similarity.ivfPqTopK(qs, hist,
        books, Similarity.pqEncode(hist, books, m = 4), m = 4, topK = 5,
        nProbe = 2)
      assert(sameRows(got, want), s"horizon $i diverged")
    }
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("stored centroid sums are EXACTLY the batch aggregate after folds") {
    // regression: a (38,10)+(38,10) add resolves to (38,9) in Spark and
    // rounds the 10th fractional digit per fold — the float-cast search
    // comparison masks it, so pin the decimal sums themselves
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("inc_ivf_sum").toString + "/ix"
    for (i <- 0 until 3)
      IncrementalIvf.mergeBatch(e.filter(col("vec_id") % 3 === i), store,
        books, batchId = i.toLong)
    val stored = KeyedStore.read(spark, s"$store/stats").get
      .filter(col("kind") === "s")
      .select(col("g").as("label"), col("pos"), col("csum").as("cv"))
    val want = Similarity.coarseCentroidSums(
        e.select(col("label").cast("string").as("label"), col("embedding")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        col("cv").cast("decimal(38,10)").as("cv"))
    assert(sameRows(stored, want), "stored sums drifted from the batch aggregate")
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("replayed fold touches nothing; directory counts the indexed corpus") {
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("inc_ivf_rp").toString + "/ix"
    IncrementalIvf.mergeBatch(e.filter(col("vec_id") % 2 === 0), store,
      books, batchId = 0L)
    val dir1 = IncrementalIvf.mergeBatch(e.filter(col("vec_id") % 2 === 1),
      store, books, batchId = 1L)
    // directory: per-label counts of everything indexed
    val want = e.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    assert(sameRows(dir1, want))
    // replay batch 0 with DIFFERENT rows: ignored, directory unchanged
    val dirR = IncrementalIvf.mergeBatch(e.limit(3), store, books,
      batchId = 1L)
    assert(sameRows(dirR, want))
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("fold-once contract enforced: a re-ingested vec_id is rejected, replay is exempt") {
    val s = spark
    import s.implicits._
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("inc_ivf_guard").toString + "/ix"
    val b0 = e.filter(col("vec_id") % 2 === 0)
    IncrementalIvf.mergeBatch(b0, store, books, batchId = 1L)
    // a LATER batch re-ingesting an already-indexed id must be rejected
    // (its embedding could have moved cells — stale rows would go live)
    val reFold = intercept[IllegalArgumentException] {
      IncrementalIvf.mergeBatch(b0.limit(1), store, books, batchId = 2L)
    }
    assert(reFold.getMessage.contains("already indexed"))
    // within-batch duplicate ids are rejected too (double-added sums)
    val b1 = e.filter(col("vec_id") % 2 === 1)
    val dup = intercept[IllegalArgumentException] {
      IncrementalIvf.mergeBatch(b1.unionByName(b1.limit(1)), store, books,
        batchId = 2L)
    }
    assert(dup.getMessage.contains("more than once"))
    // crash-window replay is EXEMPT: simulate ids landing (ver == batchId)
    // with the stats commit lost — the replayed fold must go through
    KeyedStore.merge(
      b1.select(col("vec_id").cast("long").as("vec_id"))
        .groupBy("vec_id").agg(count(lit(1)).as("cnt"))
        .withColumn("ver", lit(2L)).withColumn("op_type", lit("put")),
      s"$store/ids", keys = Seq("vec_id"), seqCols = Seq("ver"),
      numBuckets = 4, bucketCols = Seq("vec_id"),
      layoutId = Some("ivf-ids-v2"))
    val dir = IncrementalIvf.mergeBatch(b1, store, books, batchId = 2L)
    val want = e.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    assert(sameRows(dir, want), "replayed fold after the ids merge must land")
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("deleteBatch: post-delete search equals the batch chain over survivors") {
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val store = Files.createTempDirectory("inc_ivf_del").toString + "/ix"
    for (i <- 0 until 3)
      IncrementalIvf.mergeBatch(e.filter(col("vec_id") % 3 === i), store,
        books, batchId = i.toLong)
    val dels = e.filter(col("vec_id") % 5 === 0)
    IncrementalIvf.deleteBatch(dels, store, books, batchId = 3L)
    val surv = e.filter(col("vec_id") % 5 =!= 0)
    val got = IncrementalIvf.search(spark, store, qs, books, m = 4,
      topK = 5, nProbe = 2)
    val want = Similarity.ivfPqTopK(qs, surv, books,
      Similarity.pqEncode(surv, books, m = 4), m = 4, topK = 5, nProbe = 2)
    assert(sameRows(got, want), "post-delete search != batch over survivors")
    // the directory counts survivors only
    val total = IncrementalIvf.search(spark, store, qs, books, m = 4,
      topK = 5, nProbe = 2) // touch the store once more (read-only)
    val dirN = KeyedStore.readActive(spark, s"$store/stats").get
      .filter(col("kind") === "c")
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(dirN == surv.count(), s"directory $dirN != survivors")
    assert(total.count() >= 0) // consume
    // replay of the delete is a no-op
    val gen = KeyedStore.latestGeneration(spark, s"$store/stats")
    IncrementalIvf.deleteBatch(dels, store, books, batchId = 3L)
    assert(KeyedStore.latestGeneration(spark, s"$store/stats") == gen)
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("deleteBatch guards: unknown id rejected; double delete rejected; re-index allowed") {
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val store = Files.createTempDirectory("inc_ivf_delg").toString + "/ix"
    IncrementalIvf.mergeBatch(e.filter(col("vec_id") < 100), store, books,
      batchId = 0L)
    // an id never indexed
    intercept[IllegalArgumentException] {
      IncrementalIvf.deleteBatch(e.filter(col("vec_id") === 200), store,
        books, batchId = 1L)
    }
    // a within-batch duplicate would double-subtract
    intercept[IllegalArgumentException] {
      IncrementalIvf.deleteBatch(
        e.filter(col("vec_id") === 10)
          .unionByName(e.filter(col("vec_id") === 10)),
        store, books, batchId = 1L)
    }
    // legit delete, then deleting it AGAIN is rejected (not live)
    IncrementalIvf.deleteBatch(e.filter(col("vec_id") === 10), store,
      books, batchId = 1L)
    intercept[IllegalArgumentException] {
      IncrementalIvf.deleteBatch(e.filter(col("vec_id") === 10), store,
        books, batchId = 2L)
    }
    // and RE-INDEXING the erased id is allowed (the fold-once guard
    // exempts tombstones) — the index then equals the batch chain over
    // the restored corpus (ADC is approximate, so parity with the batch
    // operator is the check, not self-retrieval)
    IncrementalIvf.mergeBatch(e.filter(col("vec_id") === 10), store, books,
      batchId = 2L)
    val q10 = e.filter(col("vec_id") === 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val restored = e.filter(col("vec_id") < 100)
    val got10 = IncrementalIvf.search(spark, store, q10, books, m = 4,
      topK = 5, nProbe = 2)
    val want10 = Similarity.ivfPqTopK(q10, restored, books,
      Similarity.pqEncode(restored, books, m = 4), m = 4, topK = 5,
      nProbe = 2)
    assert(sameRows(got10, want10),
      "post-re-index search != batch over the restored corpus")
    assert(got10.count() == 5)
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }

  test("crash between the code merge and the stats commit replays clean") {
    val e = emb.localCheckpoint(true)
    val books = Similarity.pqCodebooks(e, m = 4, k = 16, iters = 2)
    val qs = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val b0 = e.filter(col("vec_id") % 2 === 0)
    val b1 = e.filter(col("vec_id") % 2 === 1)
    val store = Files.createTempDirectory("inc_ivf_cw").toString + "/ix"
    IncrementalIvf.mergeBatch(b0, store, books, batchId = 0L)
    // crash: batch 1's codes land, the stats commit never happens
    IncrementalIvf.mergeCodes(b1, store, books, m = 4, batchId = 1L,
      numBuckets = 4)
    // restart replays the whole fold — codes re-upsert idempotently,
    // sums fold exactly once
    IncrementalIvf.mergeBatch(b1, store, books, batchId = 1L)
    val got = IncrementalIvf.search(spark, store, qs, books, m = 4,
      topK = 5, nProbe = 2)
    val want = Similarity.ivfPqTopK(qs, e, books,
      Similarity.pqEncode(e, books, m = 4), m = 4, topK = 5, nProbe = 2)
    assert(sameRows(got, want))
    graft.util.Blocks.freeCheckpoint(books)
    graft.util.Blocks.freeCheckpoint(e)
  }
}

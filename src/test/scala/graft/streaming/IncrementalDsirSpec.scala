package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-batch DSIR screening over persistent hashed-bucket models: each
  * batch is judged against the models accumulated so far (never including
  * itself), the raw model grows additively batch by batch, and the whole
  * state survives a "restart" (a fresh caller over the same stores). */
class IncrementalDsirSpec extends SparkSpec {

  private val B = 4096

  test("masses accumulate exactly across batches; verdicts shift as the raw model grows") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("inc_dsir").toString
    val tgtStore = s"$dir/tgt"; val rawStore = s"$dir/raw"

    // target exemplars: vocabulary {alpha beta gamma}
    val target = Seq((100L, "alpha beta gamma alpha"), (101L, "beta gamma alpha"))
      .toDF("doc_id", "text")
    IncrementalDsir.updateModel(target, tgtStore, col("doc_id"), col("text"), B, 0L)
    // the model is bucket-bounded and inspectable: 3 distinct tokens
    assert(IncrementalDsir.readModel(s, tgtStore).count() == 3)

    // batch 0 screens against an EMPTY raw model: smoothing only on the raw
    // side, so the target-like doc is kept and the alien one dropped
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "zq xv wk jj qq zz pp"))
      .toDF("doc_id", "text")
    val out0 = IncrementalDsir.screenBatch(b0, tgtStore, rawStore,
        col("doc_id"), col("text"), B, batchId = 0L)
      .select("doc_id", "tgt_mass", "raw_mass", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // tgt counts: alpha 3, beta 2, gamma 2 (+1 smoothing each); raw empty → +1/token
    assert(out0(1L) == ((10L, 3L, true)), s"${out0(1L)}")
    assert(!out0(2L)._3, s"alien doc must drop: ${out0(2L)}")

    // batch 1 re-sends doc 1's text: the raw model now holds batch 0's
    // tokens, so raw_mass reflects them (alpha/beta/gamma once each → +2,
    // and the totals include batch 0's 10 tokens)
    val b1 = Seq((11L, "alpha beta gamma")).toDF("doc_id", "text")
    val out1 = IncrementalDsir.screenBatch(b1, tgtStore, rawStore,
        col("doc_id"), col("text"), B, batchId = 1L)
      .select("doc_id", "tgt_mass", "raw_mass", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out1(11L)._1 == 10L, s"${out1(11L)}")
    assert(out1(11L)._2 == 6L, s"raw masses must reflect batch 0: ${out1(11L)}")

    // replayed batch 1 (restart re-delivery): identical verdict, no
    // double-count in the raw model
    val rawCtBefore = IncrementalDsir.readModel(s, rawStore)
      .agg(sum("ct")).collect()(0).getLong(0)
    val replay = IncrementalDsir.screenBatch(b1, tgtStore, rawStore,
        col("doc_id"), col("text"), B, batchId = 1L)
      .select("doc_id", "tgt_mass", "raw_mass", "keep").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(replay == out1, "replay must be bit-stable")
    val rawCtAfter = IncrementalDsir.readModel(s, rawStore)
      .agg(sum("ct")).collect()(0).getLong(0)
    assert(rawCtBefore == rawCtAfter, "replayed batch must not double-count")

    // "restart": a fresh screen over the same stores still sees every count
    assert(rawCtAfter == 10L + 3L, s"accumulated raw tokens: $rawCtAfter")
  }

  test("foldModel bounds the delta log; sums and replay safety survive the fold") {
    val s = spark
    import s.implicits._
    val store = java.nio.file.Files.createTempDirectory("inc_dsir_fold").toString + "/m"
    val b0 = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val b1 = Seq((2L, "alpha gamma")).toDF("doc_id", "text")
    val b2 = Seq((3L, "beta beta")).toDF("doc_id", "text")
    IncrementalDsir.updateModel(b0, store, col("doc_id"), col("text"), 4096, 0L)
    IncrementalDsir.updateModel(b1, store, col("doc_id"), col("text"), 4096, 1L)
    IncrementalDsir.updateModel(b2, store, col("doc_id"), col("text"), 4096, 2L)
    def model(upTo: Long = Long.MaxValue): Map[Long, Long] =
      IncrementalDsir.readModel(s, store, upTo).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = model()
    assert(full.values.sum == 6L, s"$full")
    val atHorizon2 = model(upTo = 2L)

    // fold batches 0 and 1 into the base row; tombstones retained
    IncrementalDsir.foldModel(s, store, below = 2L)
    assert(model() == full, "full sums must survive the fold")
    assert(model(upTo = 2L) == atHorizon2, "the fold-point horizon must survive")
    // folded delta keys are tombstoned: live rows = bases + the batch-2 delta
    val live = KeyedStore.read(s, store).get.filter(col("op_type") =!= "delete")
    assert(live.filter(col("batch_id") >= 0 && col("batch_id") < 2).isEmpty)

    // replay of an already-folded batch loses to the tombstones: no double-count
    IncrementalDsir.updateModel(b1, store, col("doc_id"), col("text"), 4096, 1L)
    assert(model() == full, "replayed folded batch must not re-inject counts")

    // dropTombstones shrinks the store to live rows only
    IncrementalDsir.foldModel(s, store, below = 3L, dropTombstones = true)
    assert(model() == full, "sums survive the dropping fold")
    val rows = KeyedStore.read(s, store).get
    assert(rows.filter(col("op_type") === "delete").isEmpty, "tombstones compacted away")
  }

  test("foldModel refuses a horizon above the screening high-water mark") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("inc_dsir_hwm").toString
    val tgtStore = s"$dir/tgt"; val rawStore = s"$dir/raw"
    IncrementalDsir.updateModel(Seq((9L, "alpha beta")).toDF("doc_id", "text"),
      tgtStore, col("doc_id"), col("text"), B, 0L)
    IncrementalDsir.screenBatch(Seq((1L, "alpha beta")).toDF("doc_id", "text"),
      tgtStore, rawStore, col("doc_id"), col("text"), B, batchId = 0L)
    IncrementalDsir.screenBatch(Seq((2L, "beta gamma")).toDF("doc_id", "text"),
      tgtStore, rawStore, col("doc_id"), col("text"), B, batchId = 1L)
    // mark = 2 (batches 0 and 1 screened): folding ABOVE it would let a
    // future batch 2 read its own counts from the base row — must throw
    val e = intercept[IllegalArgumentException] {
      IncrementalDsir.foldModel(s, rawStore, below = 3L)
    }
    assert(e.getMessage.contains("high-water mark"), e.getMessage)
    // AT the mark is also refused by default: batch 1 (= mark - 1) was
    // screened but its sink commit may be pending, and a post-fold replay
    // of it would read its own folded counts from the base row
    val e2 = intercept[IllegalArgumentException] {
      IncrementalDsir.foldModel(s, rawStore, below = 2L)
    }
    assert(e2.getMessage.contains("REPLAYED"), e2.getMessage)
    // strictly beneath the last screened batch needs no assertion
    IncrementalDsir.foldModel(s, rawStore, below = 1L)
    assert(IncrementalDsir.readModel(s, rawStore).agg(sum("ct"))
      .collect()(0).getLong(0) == 4L)
    // the caller asserting the last batch's sink committed re-admits the mark
    IncrementalDsir.foldModel(s, rawStore, below = 2L, lastBatchCommitted = true)
    assert(IncrementalDsir.readModel(s, rawStore).agg(sum("ct"))
      .collect()(0).getLong(0) == 4L)
    // an unscreened store (no mark — e.g. the target model) folds freely
    IncrementalDsir.foldModel(s, tgtStore, below = 99L)
    assert(IncrementalDsir.readModel(s, tgtStore).agg(sum("ct"))
      .collect()(0).getLong(0) == 2L)
  }

  test("null/empty-text docs get the non-null smoothing-only verdict") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("inc_dsir_null").toString
    val batch = Seq((1L, "alpha beta"), (2L, null: String), (3L, ""))
      .toDF("doc_id", "text")
    val out = IncrementalDsir.screenBatch(batch, s"$dir/tgt", s"$dir/raw",
        col("doc_id"), col("text"), B, batchId = 0L)
      .select("doc_id", "n_toks", "tgt_mass", "raw_mass", "keep").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 2L, 2L, true)), s"${out(1L)}")
    // the null-text doc produces NO token rows: zero masses, keep =
    // (0 >= 0) = true, never NULL
    assert(out(2L) == ((0L, 0L, 0L, true)), s"${out(2L)}")
    // empty string is NOT tokenless — split("", " ") = [""], one empty token
    assert(out(3L) == ((1L, 1L, 1L, true)), s"${out(3L)}")
  }

  test("advanceHwm recovers an interrupted replace before staging (mark never regresses)") {
    val s = spark
    val dir = Files.createTempDirectory("inc_dsir_hwm").toString
    val store = s"$dir/raw"
    val mark = java.nio.file.Paths.get(store, "_graft_dsir_hwm")
    val neu = java.nio.file.Paths.get(store, "_graft_dsir_hwm__new")

    IncrementalDsir.advanceHwm(s, store, 5L)
    assert(IncrementalDsir.readHwm(s, store).contains(5L))

    // simulate a crash between delete(dst) and rename(neu, dst): only
    // `__new` survives, holding the committed mark
    java.nio.file.Files.move(mark, neu)
    assert(IncrementalDsir.readHwm(s, store).contains(5L))

    // the next advance must PROMOTE the surviving copy before touching
    // `__new` — the old code deleted it first, so a crash right after
    // that delete would lose the mark entirely
    IncrementalDsir.advanceHwm(s, store, 7L)
    assert(IncrementalDsir.readHwm(s, store).contains(7L))
    // clean terminal state: main file holds 7, no staging residue
    assert(java.nio.file.Files.exists(mark) && !java.nio.file.Files.exists(neu))
    assert(new String(java.nio.file.Files.readAllBytes(mark), "UTF-8").trim == "7")

    // a stale `__new` (older than main) must NOT be promoted over it
    java.nio.file.Files.writeString(neu, "3")
    IncrementalDsir.advanceHwm(s, store, 9L)
    assert(IncrementalDsir.readHwm(s, store).contains(9L))
    assert(new String(java.nio.file.Files.readAllBytes(mark), "UTF-8").trim == "9")
    assert(!java.nio.file.Files.exists(neu))

    // next <= current is a no-op even from the crashed state
    java.nio.file.Files.move(mark, neu)
    IncrementalDsir.advanceHwm(s, store, 4L)
    assert(IncrementalDsir.readHwm(s, store).contains(9L))
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextStats

/** Cross-batch self-LM drift gate: each batch scored against the bigram LM
  * of all PRIOR batches, models persisted as delta rows in two KeyedStores,
  * replay bit-stable, and — the anchor property — every batch's scores
  * EQUAL the batch operator (hashedLmSurprise) run against the union of its
  * prior batches. */
class IncrementalLmSpec extends SparkSpec {

  private val B = 4096

  private def drive(dir: String) = {
    val s = spark
    import s.implicits._
    val ctx = s"$dir/ctx"; val big = s"$dir/big"
    val batches = Seq(
      Seq((1L, "alpha beta gamma alpha beta"), (2L, "beta gamma alpha beta")),
      Seq((11L, "alpha beta gamma alpha"), (12L, "qq zz pp qq ww kk jj")),
      Seq((21L, "alpha beta gamma"), (22L, "qq zz pp ww"),
        (23L, "solo"), (24L, null.asInstanceOf[String])))
      .map(_.toDF("doc_id", "text"))
    val outs = batches.zipWithIndex.map { case (b, i) =>
      IncrementalLm.screenBatch(b, ctx, big, col("doc_id"), col("text"),
          B, batchId = i.toLong)
        .select("doc_id", "n_bi", "oov_ct", "surprise", "keep").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(),
            r.getBoolean(4)))).toMap
    }
    (batches, outs, ctx, big)
  }

  test("cold start keeps all; drift drops; scores equal the batch operator on the prior union") {
    val dir = Files.createTempDirectory("inc_lm").toString
    val (batches, outs, _, _) = drive(dir)
    // batch 0: empty history → everything kept, all bigrams OOV
    assert(outs(0).values.forall(_._4), s"cold start must keep all: ${outs(0)}")
    assert(outs(0)(1L)._2 == outs(0)(1L)._1, "empty model: every bigram OOV")
    // batch 1: in-distribution doc kept, alien-vocab doc dropped
    assert(outs(1)(11L)._4, s"in-distribution doc must keep: ${outs(1)(11L)}")
    assert(!outs(1)(12L)._4, s"drifted doc must drop: ${outs(1)(12L)}")
    // batch 2: degenerate docs keep with zero stats
    assert(outs(2)(23L) == ((0L, 0L, 0L, true)), s"${outs(2)(23L)}")
    assert(outs(2)(24L) == ((0L, 0L, 0L, true)), s"${outs(2)(24L)}")
    // anchor parity: batch i's (n_bi, oov_ct, surprise) == hashedLmSurprise
    // (batch i, union of batches < i) — the streaming screen IS the batch
    // operator at the horizon
    for (i <- 1 to 2) {
      val prior = batches.take(i).reduce(_ unionByName _)
      val ref = TextStats.hashedLmSurprise(batches(i), prior,
          col("doc_id"), col("text"), buckets = B)
        .select("doc_id", "n_bi", "oov_ct", "surprise").collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact()))).toMap
      val got = outs(i).view.mapValues(v => (v._1, v._2, v._3)).toMap
      assert(got == ref, s"batch $i parity: $got vs $ref")
    }
  }

  test("replay is bit-stable and never double-counts; restart resumes past the mark") {
    val dir = Files.createTempDirectory("inc_lm_rp").toString
    val (batches, outs, ctx, big) = drive(dir)
    val s = spark
    val ctBefore = IncrementalDsir.readModel(s, big).agg(sum("ct"))
      .collect()(0).getLong(0)
    val replay = IncrementalLm.screenBatch(batches(1), ctx, big,
        col("doc_id"), col("text"), B, batchId = 1L)
      .select("doc_id", "n_bi", "oov_ct", "surprise", "keep").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDecimal(3).longValueExact(),
          r.getBoolean(4)))).toMap
    assert(replay == outs(1), "replayed batch must recompute identically")
    val ctAfter = IncrementalDsir.readModel(s, big).agg(sum("ct"))
      .collect()(0).getLong(0)
    assert(ctAfter == ctBefore, "replay must not change the model")
    assert(IncrementalLm.nextBatchId(s, big) == 3L,
      "restart must resume past the screened batches")
  }

  test("maintenance fold below the mark leaves every horizon read unchanged") {
    val dir = Files.createTempDirectory("inc_lm_fold").toString
    val (_, _, ctx, big) = drive(dir)
    val s = spark
    val before = Seq(ctx, big).map(p =>
      IncrementalDsir.readModel(s, p).orderBy("b").collect().toSeq)
    Seq(ctx, big).foreach(p => IncrementalDsir.foldModel(s, p, below = 2L))
    val after = Seq(ctx, big).map(p =>
      IncrementalDsir.readModel(s, p).orderBy("b").collect().toSeq)
    assert(after == before, "fold must not change full-model reads")
    // folding ABOVE the mark is refused (the IncrementalDsir guard applies
    // to these stores because screenBatch advances their marks)
    intercept[IllegalArgumentException] {
      IncrementalDsir.foldModel(s, big, below = 4L)
    }
  }
}

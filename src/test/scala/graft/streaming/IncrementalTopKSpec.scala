package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-batch Misra-Gries heavy hitters over a persistent summary: the
  * n/(k+1) guarantee holds over the WHOLE batch history, state stays
  * bounded at k counters, replays are detected and bit-stable, and a fresh
  * caller over the same store resumes where the last one stopped. */
class IncrementalTopKSpec extends SparkSpec {

  private def items(xs: Seq[String]) = {
    import spark.implicits._
    xs.toDF("item")
  }

  test("guarantee holds across batches; state bounded; counts undercount by <= n/(k+1)") {
    val store = Files.createTempDirectory("inc_topk").toString + "/mg"
    val k = 3
    // truth across all three batches: a=30, b=12, c=3, d..i singletons
    val b0 = Seq.fill(10)("a") ++ Seq.fill(4)("b") ++ Seq("c", "d", "e")
    val b1 = Seq.fill(12)("a") ++ Seq.fill(5)("b") ++ Seq("c", "f", "g")
    val b2 = Seq.fill(8)("a") ++ Seq.fill(3)("b") ++ Seq("c", "h", "i")
    val truth = (b0 ++ b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = (b0 ++ b1 ++ b2).size.toLong
    var out: Map[String, Long] = Map.empty
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      val res = IncrementalTopK.mergeBatch(items(b), store, col("item"), k, i.toLong)
      out = res.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.size <= k, s"state bounded at k: $out")
    }
    val thresh = n / (k + 1)
    // every item above the guarantee line is present
    truth.filter(_._2 > thresh).keys.foreach { it =>
      assert(out.contains(it), s"$it (true ${truth(it)}) must be in $out")
    }
    // reported counts never overcount and undercount by at most n/(k+1)
    out.foreach { case (it, ct) =>
      assert(ct <= truth(it), s"$it overcounts: $ct > ${truth(it)}")
      assert(truth(it) - ct <= thresh, s"$it undercounts past the bound")
    }
    // the summary rows carry the guarantee metadata
    val meta = IncrementalTopK.readSummary(spark, store, k)
      .select("n_total", "thresh").distinct().collect()
    assert(meta.length == 1 && meta(0).getLong(0) == n && meta(0).getLong(1) == thresh)
  }

  test("replayed batch returns the current summary bit-stably, no double-count") {
    val store = Files.createTempDirectory("inc_topk_rp").toString + "/mg"
    val k = 2
    val b0 = Seq.fill(5)("x") ++ Seq.fill(2)("y")
    val b1 = Seq.fill(4)("x") ++ Seq("z")
    IncrementalTopK.mergeBatch(items(b0), store, col("item"), k, 0L)
    val first = IncrementalTopK.mergeBatch(items(b1), store, col("item"), k, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    // replay of batch 1 (same id): identical output, state untouched
    val replay = IncrementalTopK.mergeBatch(items(b1), store, col("item"), k, 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(replay == first, s"$replay vs $first")
    val after = IncrementalTopK.readSummary(spark, store, k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(after == first, "store state unchanged by the replay")
  }

  test("an all-evicting fold preserves n_total and replay detection (meta row)") {
    val store = Files.createTempDirectory("inc_topk_ev").toString + "/mg"
    val k = 2
    // fold 0: two equal counters fill the state exactly
    IncrementalTopK.mergeBatch(items(Seq.fill(5)("a") ++ Seq.fill(5)("b")),
      store, col("item"), k, 0L)
    // fold 1: a third equal count -> cut = 5 -> EVERY counter evicted
    val s1 = IncrementalTopK.mergeBatch(items(Seq.fill(5)("c")), store,
      col("item"), k, 1L).collect()
    assert(s1.isEmpty, s"all counters evicted: ${s1.toSeq}")
    // history must survive the empty state: n_total = 15, and a replay of
    // fold 1 must be DETECTED (not re-folded — it would resurrect c)
    val replay = IncrementalTopK.mergeBatch(items(Seq.fill(5)("c")), store,
      col("item"), k, 1L).collect()
    assert(replay.isEmpty, s"replay must not resurrect evicted counts: ${replay.toSeq}")
    // fold 2 keeps accumulating from the true history
    val s2 = IncrementalTopK.mergeBatch(items(Seq.fill(9)("d")), store,
      col("item"), k, 2L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(s2.toSeq == Seq(("d", 9L, 24L, 8L)), s"${s2.toSeq}")
  }

  test("a fresh caller resumes over the same store (restart)") {
    val store = Files.createTempDirectory("inc_topk_rs").toString + "/mg"
    val k = 2
    IncrementalTopK.mergeBatch(items(Seq.fill(6)("p") ++ Seq("q")), store,
      col("item"), k, 0L)
    // "restart": no shared driver state, just the store path
    val res = IncrementalTopK.mergeBatch(items(Seq.fill(3)("p") ++ Seq.fill(2)("r")),
        store, col("item"), k, 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // p's count survives the restart: 6 (batch 0 kept all, <= k items) + 3
    assert(res("p") >= 9L - (12L / 3), s"p accumulated across the restart: $res")
    assert(res("p") <= 9L)
    val n = IncrementalTopK.readSummary(spark, store, k)
      .select("n_total").distinct().collect().map(_.getLong(0)).toSeq
    assert(n == Seq(12L), s"n_total accumulates: $n")
  }
}

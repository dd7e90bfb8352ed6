package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Profile

/** Cross-batch HLL: register-max fold == the batch register table over the
  * concatenated history at EVERY horizon; idempotent (no HWM — re-folding
  * writes nothing), precision pinned, summary readable from the store. */
class IncrementalHllSpec extends SparkSpec {

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("fold equals batch registers over concatenated history at every horizon") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hll").toString + "/store"
    val rnd = new scala.util.Random(11)
    val batches = (0 until 3).map { _ =>
      (0 until 600).map(_ => (s"g${rnd.nextInt(2)}", s"v${rnd.nextInt(5000)}"))
    }
    var history = Seq.empty[(String, String)]
    for ((rows, bid) <- batches.zipWithIndex) {
      history ++= rows
      val got = regMap(IncrementalHll.mergeBatch(rows.toDF("g", "v"), store,
        col("g"), col("v"), batchId = bid.toLong))
      val want = regMap(Profile.hllRegisters(history.toDF("g", "v"),
        Seq("g"), col("v")))
      assert(got == want, s"horizon $bid diverged")
    }

    // summary off the store == batch summary; estimate in tolerance
    val gotSum = IncrementalHll.readSummary(s, store)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val wantSum = Profile.hllSummary(
      Profile.hllRegisters(history.toDF("g", "v"), Seq("g"), col("v")),
      Seq("g"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotSum == wantSum)
    val exact = history.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    gotSum.foreach { case (g, (zeros, hNum)) =>
      val est = Profile.hllEstimate(zeros, hNum)
      assert(math.abs(est - exact(g)).toDouble / exact(g) < 0.10,
        s"$g: est $est vs exact ${exact(g)}")
    }
  }

  test("re-folding any batch is a no-op write; precision mismatch fails fast") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hll_rp").toString + "/store"
    val b0 = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "v")
    val first = regMap(IncrementalHll.mergeBatch(b0, store,
      col("g"), col("v"), batchId = 0L))
    val v0 = KeyedStore.read(s, store).get
      .filter(col("kind") === "v").agg(max(col("ver"))).head().getLong(0)
    // idempotent: same batch again under a NEW batch id — registers
    // unchanged, and no register row rewritten (max no-op writes nothing)
    val again = regMap(IncrementalHll.mergeBatch(b0, store,
      col("g"), col("v"), batchId = 1L))
    assert(again == first)
    val after = KeyedStore.read(s, store).get.filter(col("kind") === "v")
    assert(after.count() == first.size.toLong)
    assert(after.agg(max(col("ver"))).head().getLong(0) == v0,
      "an all-stable fold must not rewrite register rows")
    val ex = intercept[IllegalArgumentException] {
      IncrementalHll.mergeBatch(b0, store, col("g"), col("v"), p = 12,
        batchId = 2L)
    }
    assert(ex.getMessage.contains("identity"))
  }

  test("register improvements land regardless of batch-id order") {
    // the store's sequence is the RANK, not the batch id: repeated and
    // out-of-order ids must still keep the true register max
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hll_oo").toString + "/store"
    val rnd = new scala.util.Random(13)
    val a = (0 until 300).map(_ => ("g", s"a${rnd.nextInt(2000)}"))
    val b = (0 until 300).map(_ => ("g", s"b${rnd.nextInt(2000)}"))
    val c = (0 until 300).map(_ => ("g", s"c${rnd.nextInt(2000)}"))
    // ids: 5, then 3 (out of order), then 5 again (repeat)
    IncrementalHll.mergeBatch(a.toDF("g", "v"), store, col("g"), col("v"),
      batchId = 5L)
    IncrementalHll.mergeBatch(b.toDF("g", "v"), store, col("g"), col("v"),
      batchId = 3L)
    IncrementalHll.mergeBatch(c.toDF("g", "v"), store, col("g"), col("v"),
      batchId = 5L)
    val got = regMap(IncrementalHll.readRegisters(s, store))
    val want = regMap(graft.ext.Profile.hllRegisters(
      (a ++ b ++ c).toDF("g", "v"), Seq("g"), col("v")))
    assert(got == want)
  }
}

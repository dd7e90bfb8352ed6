package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Profile

/** Cross-batch histogram quantiles: bin-wise-add fold over a fixed frame ==
  * the framed batch sketch over the concatenated history at EVERY horizon,
  * with O(groups·bins) state, replay safety, frame pinning, and restart. */
class IncrementalHistSpec extends SparkSpec {

  private val Qs = Seq((1, 2), (9, 10), (99, 100))

  private def snap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Any]] =
    df.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.get)).toMap

  test("fold equals the framed batch sketch over concatenated history at every horizon") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hist").toString + "/store"
    val rnd = new scala.util.Random(3)
    val batches = (0 until 3).map { b =>
      (0 until 400).map { _ =>
        val g = s"g${rnd.nextInt(3)}"
        // values straddle the frame on purpose: clamping must fold too
        (g, (rnd.nextInt(1400) - 100).toLong)
      }
    }
    val (lo, hi, bins) = (0L, 1199L, 64)
    var history = Seq.empty[(String, Long)]
    for ((rows, bid) <- batches.zipWithIndex) {
      history ++= rows
      val got = IncrementalHist.mergeBatch(rows.toDF("g", "v"), store,
        col("g"), col("v"), lo, hi, bins, bid.toLong, Qs)
      val want = Profile.histQuantilesFramed(history.toDF("g", "v"),
        Seq("g"), col("v"), lo, hi, bins, Qs)
      assert(snap(got) == snap(want), s"horizon $bid diverged")
    }

    // O(groups*bins) state: 3 groups x <=64 bins + 1 meta row
    val live = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete")
    assert(live.count() <= 3L * 64 + 1)

    // restart: a fresh read-only caller sees the same estimates
    val got = snap(IncrementalHist.readEstimate(s, store, Qs))
    val want = snap(Profile.histQuantilesFramed(history.toDF("g", "v"),
      Seq("g"), col("v"), lo, hi, bins, Qs))
    assert(got == want)
  }

  test("replayed fold leaves state untouched; frame mismatch fails fast") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hist_rp").toString + "/store"
    val b0 = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("g", "v")
    val first = snap(IncrementalHist.mergeBatch(b0, store,
      col("g"), col("v"), 0L, 99L, 10, 0L, Qs))
    // replay batch 0 with DIFFERENT rows: must be ignored, estimates stable
    val replay = snap(IncrementalHist.mergeBatch(
      Seq(("a", 90L)).toDF("g", "v"), store,
      col("g"), col("v"), 0L, 99L, 10, 0L, Qs))
    assert(replay == first)
    assert(snap(IncrementalHist.readEstimate(s, store, Qs)) == first)
    // the frame is the store's identity
    val ex = intercept[IllegalArgumentException] {
      IncrementalHist.mergeBatch(b0, store, col("g"), col("v"),
        0L, 999L, 10, 1L, Qs)
    }
    assert(ex.getMessage.contains("framed"))
  }

  test("tvDrift: 0 for the same distribution, 1 for disjoint bins, hand-computed middle") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_hist_tv").toString + "/store"
    // frame [0, 99] x 10 bins, width 10: values land in v div 10
    val stored = Seq(("a", 5L), ("a", 15L), ("a", 15L), ("a", 25L),
      ("b", 5L), ("z", 5L))
    IncrementalHist.mergeBatch(stored.toDF("g", "v"), store, col("g"),
      col("v"), 0L, 99L, 10, 0L, Qs)
    def drift(rows: Seq[(String, Long)]): Map[String, (Long, Long, BigDecimal, BigDecimal)] =
      IncrementalHist.tvDrift(s, store, rows.toDF("g", "v"), col("g"),
        col("v")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          BigDecimal(r.getDecimal(3)), BigDecimal(r.getDecimal(4))))).toMap
    // identical multiset -> every |o*n_s - s*n_b| term is 0
    val same = drift(stored.filter(_._1 == "a"))
    assert(same("a") == ((4L, 4L, BigDecimal(0), BigDecimal(32))))
    // disjoint bins -> TV = 1 (num == den); group 'b' only, 'z' omitted
    val disj = drift(Seq(("b", 95L), ("b", 85L)))
    assert(disj.keySet == Set("b"))
    assert(disj("b")._3 == disj("b")._4)
    // hand-computed: store a = {bin0:1, bin1:2, bin2:1} (n_s=4),
    // batch a = {bin0:1, bin1:1} (n_b=2) ->
    // terms |1*4-1*2| + |1*4-2*2| + |0*4-1*2| = 2 + 0 + 2 = 4, den 16
    val mid = drift(Seq(("a", 5L), ("a", 15L)))
    assert(mid("a") == ((2L, 4L, BigDecimal(4), BigDecimal(16))))
  }
}

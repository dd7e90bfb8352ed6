package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Profile

/** Cross-batch count-min: bin-wise-add fold == the batch cell table over
  * the concatenated history at EVERY horizon, with O(groups·d·w) state,
  * replay safety, parameter pinning, and probe estimates off the store. */
class IncrementalCmsSpec extends SparkSpec {

  private def cellMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("fold equals the batch cell table over concatenated history at every horizon") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cms").toString + "/store"
    val rnd = new scala.util.Random(7)
    val batches = (0 until 3).map { _ =>
      (0 until 500).map { _ =>
        (s"g${rnd.nextInt(2)}", s"k${rnd.nextInt(40)}")
      }
    }
    var history = Seq.empty[(String, String)]
    for ((rows, bid) <- batches.zipWithIndex) {
      history ++= rows
      val got = cellMap(IncrementalCms.mergeBatch(rows.toDF("g", "k"), store,
        col("g"), col("k"), bid.toLong))
      val want = cellMap(Profile.cmsCells(history.toDF("g", "k"),
        Seq("g"), col("k")))
      assert(got == want, s"horizon $bid diverged")
    }

    // probe estimates off the persisted store match the batch estimates
    val probes = (0 until 40).map(k => ("g0", s"k$k")).toDF("g", "key")
    val gotEst = IncrementalCms.estimate(s, store, probes)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val wantEst = Profile.cmsEstimate(
      Profile.cmsCells(history.toDF("g", "k"), Seq("g"), col("k")),
      probes, Seq("g"), col("key"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(gotEst == wantEst)
    // estimates never undercount the exact per-key counts
    val exact = history.filter(_._1 == "g0").groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) => assert(gotEst(k) >= n, s"undercount $k") }

    // O(groups·d·w) state bound: cells ≤ touched, + 1 meta row
    val live = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete")
    assert(live.count() <= 2L * 4 * 4096 + 1)
  }

  test("replayed fold leaves state untouched; (d, w) mismatch fails fast") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cms_rp").toString + "/store"
    val b0 = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "k")
    val first = cellMap(IncrementalCms.mergeBatch(b0, store,
      col("g"), col("k"), 0L))
    // replay batch 0 with DIFFERENT rows: ignored, cells stable
    val replay = cellMap(IncrementalCms.mergeBatch(
      Seq(("a", "z")).toDF("g", "k"), store, col("g"), col("k"), 0L))
    assert(replay == first)
    assert(cellMap(IncrementalCms.readCells(s, store)) == first)
    val ex = intercept[IllegalArgumentException] {
      IncrementalCms.mergeBatch(b0, store, col("g"), col("k"), 1L, d = 2)
    }
    assert(ex.getMessage.contains("identity"))
  }
}

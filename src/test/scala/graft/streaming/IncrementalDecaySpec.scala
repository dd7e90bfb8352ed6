package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exponentially decayed counts: the integer halving fold, tombstoned
  * decay-out, replay safety, and restart reads. */
class IncrementalDecaySpec extends SparkSpec {

  private def snap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("fold formula: w = w div 2 + c*unit, hand-computed over three folds") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_dec").toString + "/store"
    val u = 100L
    // a: counts 3, 0, 1 -> ((300 div 2) + 0) div 2 + 100 = 175
    // b: counts 0, 2, 0 -> (200) div 2 = 100
    val batches = Seq(Seq.fill(3)("a"), Seq("b", "b"), Seq("a"))
    var out: org.apache.spark.sql.DataFrame = null
    for ((ks, i) <- batches.zipWithIndex)
      out = IncrementalDecay.mergeBatch(ks.toDF("k"), store, col("k"),
        i.toLong, unit = u)
    assert(snap(out) == Map("a" -> 175L, "b" -> 100L))
    assert(snap(IncrementalDecay.readWeights(s, store)) ==
      Map("a" -> 175L, "b" -> 100L))
  }

  test("a silent key decays to exact zero and is tombstoned out of state") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_dec_z").toString + "/store"
    IncrementalDecay.mergeBatch(Seq("x").toDF("k"), store, col("k"), 0L,
      unit = 4L) // w = 4
    val empty = Seq.empty[String].toDF("k")
    IncrementalDecay.mergeBatch(empty, store, col("k"), 1L, unit = 4L) // 2
    IncrementalDecay.mergeBatch(empty, store, col("k"), 2L, unit = 4L) // 1
    val last = IncrementalDecay.mergeBatch(empty, store, col("k"), 3L,
      unit = 4L) // 0 -> tombstone
    assert(last.isEmpty)
    val live = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete" && col("kind") === "v")
    assert(live.isEmpty, "decayed-out key must leave no live state")
  }

  test("unit is store identity: a mismatched fold fails fast") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_dec_u").toString + "/store"
    IncrementalDecay.mergeBatch(Seq("a").toDF("k"), store, col("k"), 0L,
      unit = 100L)
    // a changed unit would silently mix weight scales across folds; the
    // rejection must not leak the pinned store read
    val before = s.sparkContext.getPersistentRDDs.keySet
    val ex = intercept[IllegalArgumentException] {
      IncrementalDecay.mergeBatch(Seq("a").toDF("k"), store, col("k"), 1L,
        unit = 10L)
    }
    assert(ex.getMessage.contains("identity"))
    assert(s.sparkContext.getPersistentRDDs.keySet == before,
      "guarded rejection leaked pinned blocks")
    // same-unit folds still work after the rejected one
    val w = snap(IncrementalDecay.mergeBatch(Seq("a").toDF("k"), store,
      col("k"), 1L, unit = 100L))
    assert(w == Map("a" -> 150L))
  }

  test("drives a foreachBatch stream end-to-end; weights match the manual folds") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val store = java.nio.file.Files.createTempDirectory("inc_dec_st")
      .toString + "/store"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = mem.toDF().toDF("k").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
        IncrementalDecay.mergeBatch(batch, store, col("k"), bid, unit = 100L)
        ()
      }
      .start()
    try {
      mem.addData("a", "a", "a"); q.processAllAvailable() // a: 300
      mem.addData("b", "b"); q.processAllAvailable()      // a: 150, b: 200
      mem.addData("a"); q.processAllAvailable()           // a: 175, b: 100
      val got = snap(IncrementalDecay.readWeights(s, store))
      assert(got == Map("a" -> 175L, "b" -> 100L), got)
    } finally q.stop()
  }

  test("replayed fold returns weights without double-decaying") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_dec_rp").toString + "/store"
    IncrementalDecay.mergeBatch(Seq("a", "a").toDF("k"), store, col("k"), 0L,
      unit = 100L)
    val w1 = snap(IncrementalDecay.mergeBatch(Seq("a").toDF("k"), store,
      col("k"), 1L, unit = 100L)) // 200 div 2 + 100 = 200
    assert(w1 == Map("a" -> 200L))
    // replay batch 1: the halving must NOT run again
    val replayed = snap(IncrementalDecay.mergeBatch(Seq("a").toDF("k"), store,
      col("k"), 1L, unit = 100L))
    assert(replayed == w1)
  }
}

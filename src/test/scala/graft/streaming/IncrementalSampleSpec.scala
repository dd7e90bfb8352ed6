package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Curation

/** Cross-batch bottom-k sample: the fold equals the batch operator over
  * concatenated history at every horizon, state stays at k per stratum,
  * refolds are idempotent no-ops, and a fresh reader sees the sample. */
class IncrementalSampleSpec extends SparkSpec {

  private def snap(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("fold equals batch bottomKSample over concatenated history; k-bounded state") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_samp").toString + "/store"
    val batches = Seq(0L until 200L, 200L until 500L, 500L until 900L)
    var history = Seq.empty[Long]
    for ((ids, bid) <- batches.zipWithIndex) {
      history ++= ids
      val batch = ids.map(i => (i, s"g${i % 2}")).toDF("doc_id", "grp")
      val got = IncrementalSample.mergeBatch(batch, store,
        col("doc_id"), col("grp"), k = 25)
      val want = Curation.bottomKSample(
        history.map(i => (i, s"g${i % 2}")).toDF("doc_id", "grp"),
        col("doc_id"), col("grp"), k = 25)
      assert(snap(got) == snap(want), s"horizon $bid diverged")
      assert(snap(got).groupBy(_._1).forall(_._2.size == 25))
    }
    // live state never exceeds strata * k (plus the one k-identity meta row)
    val live = KeyedStore.read(s, store).get
      .filter(col("op_type") =!= "delete" && col("kind") === "v")
    assert(live.count() <= 2L * 25)
  }

  test("refolding an already-folded batch writes nothing") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_samp_rf").toString + "/store"
    val b0 = (0L until 300L).map(i => (i, "g")).toDF("doc_id", "grp")
    val first = snap(IncrementalSample.mergeBatch(b0, store,
      col("doc_id"), col("grp"), k = 20))
    val rows0 = KeyedStore.read(s, store).get
      .select(col("g"), col("id"), col("ver"), col("op_type"))
      .collect().map(_.toSeq).toSet
    val again = snap(IncrementalSample.mergeBatch(b0, store,
      col("doc_id"), col("grp"), k = 20))
    val rows1 = KeyedStore.read(s, store).get
      .select(col("g"), col("id"), col("ver"), col("op_type"))
      .collect().map(_.toSeq).toSet
    assert(again == first)
    assert(rows1 == rows0, "idempotent refold must not touch the store")
  }

  test("k is store identity: a mismatched fold fails fast") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_samp_k").toString + "/store"
    val b0 = (0L until 100L).map(i => (i, "g")).toDF("doc_id", "grp")
    IncrementalSample.mergeBatch(b0, store, col("doc_id"), col("grp"), k = 20)
    // a smaller k would tombstone rows the store could never recover; the
    // rejection must not leak the pinned store read
    val before = s.sparkContext.getPersistentRDDs.keySet
    val ex = intercept[IllegalArgumentException] {
      IncrementalSample.mergeBatch(b0, store, col("doc_id"), col("grp"), k = 5)
    }
    assert(ex.getMessage.contains("identity"))
    assert(s.sparkContext.getPersistentRDDs.keySet == before,
      "guarded rejection leaked pinned blocks")
    // the guarded store is untouched: same-k folds still work
    assert(snap(IncrementalSample.readSample(s, store)).size == 20)
  }

  test("restart: a fresh reader sees the folded sample") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_samp_rs").toString + "/store"
    val b0 = (0L until 400L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val folded = snap(IncrementalSample.mergeBatch(b0, store,
      col("doc_id"), col("grp"), k = 10))
    assert(snap(IncrementalSample.readSample(s, store)) == folded)
  }
}

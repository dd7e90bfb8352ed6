package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Cross-batch centroid sums: integer add-fold == the batch operator over
  * concatenated history at every horizon; replay safety; the drift gate
  * reads 1.0 for in-distribution batches and flags a shifted class. */
class IncrementalCentroidSpec extends SparkSpec {

  private def sums(df: org.apache.spark.sql.DataFrame): Map[(String, Long), (Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3)))).toMap

  private def emb = graft.model.Envelopes.table(spark, sfDir(), "embeddings")

  test("fold equals batch centroid sums over concatenated history at every horizon") {
    val s = spark
    val store = Files.createTempDirectory("inc_cent").toString + "/store"
    val e = emb
    var hist: org.apache.spark.sql.DataFrame = null
    for (i <- 0 until 3) {
      val b = e.filter(col("vec_id") % 3 === i)
      hist = if (hist == null) b else hist.unionByName(b)
      val got = sums(IncrementalCentroid.mergeBatch(b, store,
        col("label"), col("embedding"), i.toLong))
      val want = sums(Similarity.labelCentroidSums(
        hist.select(col("label").cast("string").as("label"), col("embedding")))
        .select(col("label"), col("pos"), col("s_sum"), col("n")))
      assert(got == want, s"horizon $i diverged")
    }
    // replay with different rows: ignored
    val cur = sums(IncrementalCentroid.readSums(s, store))
    val replay = sums(IncrementalCentroid.mergeBatch(
      e.filter(col("vec_id") % 3 === 0), store,
      col("label"), col("embedding"), 2L))
    assert(replay == cur)
  }

  test("drift gate: in-distribution batch reads ~1.0, a shifted class flags") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cent_dr").toString + "/store"
    val e = emb
    IncrementalCentroid.mergeBatch(e, store, col("label"), col("embedding"),
      0L)
    // the same corpus re-scored against its own profile: proportional sums
    val same = IncrementalCentroid.drift(s, store, e, col("label"),
      col("embedding")).collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(same.nonEmpty && same.forall(_._2 > 0.9999), same.mkString(", "))
    // one label's vectors negated: its centroid flips, drift collapses
    val shifted = e.filter(col("label") === 0).select(col("label"),
      transform(col("embedding"), x => -x).as("embedding"))
    val dr = IncrementalCentroid.drift(s, store, shifted, col("label"),
      col("embedding")).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dr("0") < 0.0, s"negated class must anti-correlate: ${dr("0")}")
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Profile

/** Cross-batch KMV sketch: the fold is LOSSLESS vs the batch sketch over
  * the concatenated history (k smallest of a union = k-min merge), replay
  * is a no-op, and a fresh reader resumes the same state. */
class IncrementalKmvSpec extends SparkSpec {

  private val K = 64

  test("folded sketch equals the batch sketch over all batches; replay no-ops") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("inc_kmv").toString + "/store"
    // three batches, overlapping values, two groups of very different size
    val batches = Seq(
      (1 to 300).map(i => ("big", i.toLong)) ++ (1 to 10).map(i => ("small", i.toLong)),
      (200 to 500).map(i => ("big", i.toLong)) ++ (5 to 20).map(i => ("small", i.toLong)),
      (450 to 900).map(i => ("big", i.toLong)))
      .map(_.toDF("g", "v"))
    var last: Map[String, (Long, Long)] = Map.empty
    batches.zipWithIndex.foreach { case (b, i) =>
      last = IncrementalKmv.mergeBatch(b, dir, col("g"), col("v"), K, i.toLong)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val ref = Profile.kmvDistinct(batches.reduce(_ unionByName _),
        Seq("g"), col("v"), K)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(last == ref, s"fold must equal the batch sketch: $last vs $ref")
    // small group is under k → exact count of its 20 distinct values
    assert(last("small") == ((20L, 20L)), s"${last("small")}")
    // big group: 900 distinct, k=64 → estimate within ~3 std errs (≈ 38 %)
    val est = last("big")._2
    assert(est > 550 && est < 1350, s"estimate $est out of band for 900")
    // replay of the last batch: identical estimates, store untouched
    val replay = IncrementalKmv.mergeBatch(batches(2), dir, col("g"), col("v"),
        K, batchId = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(replay == last, "replayed fold must be a read-only no-op")
    // a fresh reader (restart) sees the same state
    val rd = IncrementalKmv.readEstimate(s, dir, K)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rd == last)
    // state is O(k) per group: at most k live value rows per group
    val liveRows = KeyedStore.read(s, dir).get
      .filter(col("op_type") =!= "delete" && col("kind") === "v")
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(liveRows.values.forall(_ <= K), s"state must stay <= k: $liveRows")
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-batch NEAR-dup rejection over the persistent signature store: a
  * re-phrased re-arrival (not byte-identical — one token differs) must be
  * rejected in a later batch, across callers, while genuinely new content
  * and unshingleable shorts pass. */
class IncrementalLshSpec extends SparkSpec {

  // 12 distinct tokens; a one-token tail change keeps 9 of 10 trigram
  // shingles (J = 9/11 ≈ 0.82) — a near-dup under the 1/2 threshold with a
  // comfortable signature-estimate margin
  private def text(prefix: String, tail: String): String =
    (1 to 11).map(i => s"${prefix}_w$i").mkString(" ") + " " + tail

  test("near-dup re-arrivals are rejected across batches and callers") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_lsh").toString + "/store"

    // batch 0: doc 1 and its one-token variant doc 2 (within-batch cluster,
    // min id kept), unrelated doc 3
    val b0 = Seq(
      (1L, text("alpha", "alpha_w12")),
      (2L, text("alpha", "alpha_x12")),
      (3L, text("beta", "beta_w12"))).toDF("doc_id", "text")
    val out0 = IncrementalLsh.dedupBatch(b0, store, col("doc_id"), col("text"), 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out0 == Set(1L, 3L), s"got $out0")

    // batch 1: doc 4 is ANOTHER variant of doc 1 (cross-batch near-dup —
    // never seen byte-identically), doc 5 is new content
    val b1 = Seq(
      (4L, text("alpha", "alpha_y12")),
      (5L, text("gamma", "gamma_w12"))).toDF("doc_id", "text")
    val out1 = IncrementalLsh.dedupBatch(b1, store, col("doc_id"), col("text"), 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out1 == Set(5L), s"got $out1")

    // "restart": a fresh caller over the same store still knows doc 3's
    // neighborhood; a short unshingleable doc passes the near-dup screens
    val b2 = Seq(
      (6L, text("beta", "beta_z12")),
      (7L, "tiny doc")).toDF("doc_id", "text")
    val out2 = IncrementalLsh.dedupBatch(b2, store, col("doc_id"), col("text"), 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out2 == Set(7L), s"got $out2")

    // the index holds signatures for exactly the accepted shingleable docs
    val indexed = KeyedStore.read(s, store).get
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 3L, 5L))
  }
}

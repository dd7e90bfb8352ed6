package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup
import graft.model.Envelopes

/** Cross-batch Bloom decontamination: the persisted set-bit table unions
  * across eval folds, so the screen equals the batch operator over the
  * concatenated eval suite at every horizon; re-folds are idempotent;
  * (m, k) are pinned; state stays ≤ m rows. */
class IncrementalBloomSpec extends SparkSpec {

  private val M = 1 << 12
  private val K = 3

  private def flags(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Boolean)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("screen equals the batch operator over the concatenated eval suite at every horizon") {
    val s = spark
    val store = Files.createTempDirectory("inc_bloom").toString + "/store"
    val docs = Envelopes.table(s, sfDir(), "documents")
    val sh = Dedup.shingles(docs, col("doc_id"), col("text")).localCheckpoint(true)
    val train = sh.filter(col("doc_id") % 97 =!= 0)
    val eval1 = sh.filter(col("doc_id") % 97 === 0 && col("doc_id") % 2 === 0)
    val eval2 = sh.filter(col("doc_id") % 97 === 0 && col("doc_id") % 2 =!= 0)

    val fill1 = IncrementalBloom.addEval(eval1, store, M, K, batchId = 0L)
    assert(flags(IncrementalBloom.screenBatch(train, store, M, K)) ==
      flags(Dedup.bloomScreen(train, eval1, M, K)), "horizon 1 diverged")

    val fill2 = IncrementalBloom.addEval(eval2, store, M, K, batchId = 1L)
    assert(fill2 >= fill1 && fill2 <= M.toLong)
    val want = flags(Dedup.bloomScreen(train, eval1.unionByName(eval2), M, K))
    assert(flags(IncrementalBloom.screenBatch(train, store, M, K)) == want,
      "horizon 2 diverged")

    // idempotent: re-folding eval1 changes nothing (set union)
    val fill3 = IncrementalBloom.addEval(eval1, store, M, K, batchId = 2L)
    assert(fill3 == fill2)
    assert(flags(IncrementalBloom.screenBatch(train, store, M, K)) == want)

    // state bound: at most m value rows + 1 meta row
    assert(KeyedStore.read(s, store).get.count() <= M.toLong + 1)

    // the parameters are the filter's identity
    val ex = intercept[IllegalArgumentException] {
      IncrementalBloom.addEval(eval1, store, M / 2, K, batchId = 3L)
    }
    assert(ex.getMessage.contains("identity"))
    intercept[IllegalArgumentException] {
      IncrementalBloom.screenBatch(train, store, M, K + 1)
    }
  }
}

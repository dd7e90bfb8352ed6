package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The public share-the-intermediate entry point: one corpus tokenize feeds
  * every shingle screen, derived tables are computed once, and release()
  * frees every pinned block with recompute-on-next-access semantics. */
class SharedIndexSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat tonight"), // near dup of 1
      (4L, "completely different text about training data pipelines"),
      (5L, "unrelated short doc")
    ).toDF("doc_id", "text")
  }

  test("two screens over one index: tables are computed once and match the direct operators") {
    val idx = new Dedup.SharedIndex(corpus, col("doc_id"), col("text"))
    // the memoized tables are literally the same DataFrame instance on
    // every access — the second screen cannot re-tokenize
    assert(idx.shingles eq idx.shingles)
    assert(idx.lshPairs eq idx.lshPairs)
    assert(idx.clusterLabels eq idx.clusterLabels)

    // screen 1 (Jaccard pairs) and screen 2 (containment pairs) both ride
    // the index's shingle table, and agree with the direct per-screen path
    val direct = Dedup.shingles(corpus, col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val Seq(a, b) = df.columns.take(2).toSeq
      df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(pairs(Dedup.ngramJaccardPairs(idx.shingles, 1, 2)) ==
      pairs(Dedup.ngramJaccardPairs(direct, 1, 2)))
    assert(pairs(Dedup.containmentPairs(idx.shingles, 9, 10)) ==
      pairs(Dedup.containmentPairs(direct, 9, 10)))

    // the LSH pair + cluster derivations see the dups the corpus plants
    assert(pairs(idx.lshPairs).contains((1L, 2L)))
    val keepers = idx.clusterLabels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(2L) == 1L && keepers(3L) == 1L)
  }

  test("release() frees every pinned block; a released index recomputes identically") {
    val sc = spark.sparkContext
    def pinnedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    val before = pinnedIds
    val idx = new Dedup.SharedIndex(corpus, col("doc_id"), col("text"))
    val labels0 = idx.clusterLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val added = pinnedIds -- before
    assert(added.nonEmpty, "materialized index must pin checkpoint blocks")
    idx.release()
    // release drops the three tables' checkpoint RDDs synchronously;
    // unreferenced loop intermediates (per-round CC labels, LSH signatures)
    // are swept by the ContextCleaner once GC notices them — poll briefly
    val deadline = System.currentTimeMillis() + 30000
    def leftover: Set[Int] = pinnedIds intersect added
    while (leftover.nonEmpty && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    val detail = sc.getPersistentRDDs.view
      .filterKeys(leftover).map { case (id, r) =>
        s"$id:${r.name}:${r.getStorageLevel.description}:${r.toString}"
      }.mkString("; ")
    assert(leftover.isEmpty, s"blocks still pinned after release: $detail")
    // recompute-on-next-access: same results from a fresh materialization
    val labels1 = idx.clusterLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels1 == labels0)
    idx.release()
  }
}

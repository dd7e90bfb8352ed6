package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Cross-batch connected components over a persistent label store: every
  * fold equals the batch operator over the concatenated pair history
  * (star edges preserve old connectivity), folds are idempotent, merges
  * across historical clusters re-label exactly the losing side, and the
  * store survives restart at O(nodes) rows. */
class IncrementalCcSpec extends SparkSpec {

  private def labs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("fold equals batch components over concatenated pairs at every horizon") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc").toString + "/store"
    // batch 0: two clusters {1,2,3} and {10,11}; batch 1: extend + new
    // cluster {20,21}; batch 2: one edge MERGES the two old clusters
    val batches = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L)),
      Seq((3L, 4L), (20L, 21L)),
      Seq((11L, 4L)))
    var history = Seq.empty[(Long, Long)]
    for ((b, i) <- batches.zipWithIndex) {
      history ++= b
      val got = labs(IncrementalCc.mergePairs(b.toDF("a_id", "b_id"), store))
      val want = labs(Dedup.connectedComponents(history.toDF("a_id", "b_id")))
      assert(got == want, s"horizon $i diverged: $got vs $want")
    }
    // the final merge collapsed everything reachable onto keeper 1
    val fin = labs(IncrementalCc.readLabels(s, store))
    assert(Set(2L, 3L, 4L, 10L, 11L).forall(fin(_) == 1L), s"$fin")
    assert(fin(21L) == 20L)

    // idempotent: re-folding an old batch changes nothing
    val again = labs(IncrementalCc.mergePairs(
      batches.head.toDF("a_id", "b_id"), store))
    assert(again == fin)
    assert(labs(IncrementalCc.readLabels(s, store)) == fin)

    // O(nodes) state: one row per node ever seen
    assert(KeyedStore.read(s, store).get.count() == fin.size.toLong)
  }

  test("member-index heal: a label commit the index missed is rebuilt, not trusted") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_heal").toString + "/store"
    // two clusters via the normal path: {5,9} keeper 5, {30,31} keeper 30
    IncrementalCc.mergePairs(
      Seq((5L, 9L), (30L, 31L)).toDF("a_id", "b_id"), store).count()
    // simulate the crash window: a label merge COMMITS (node 1 joins
    // {5,9}, relabeling the cluster to keeper 1) but the member-index
    // merge is lost — written here straight to the label store with the
    // ver the crashed fold would have used (nextVer = labelGen + 1 = 2)
    KeyedStore.merge(
      Seq((1L, 1L, 2L, "put"), (5L, 1L, 2L, "put"), (9L, 1L, 2L, "put"))
        .toDF("doc_id", "keeper_id", "ver", "op_type"),
      store, keys = Seq("doc_id"), seqCols = Seq("ver"),
      numBuckets = 4, bucketCols = Seq("doc_id"))
    // next fold touches the stale cluster with a smaller node: without the
    // heal, the index still lists 5/9 under keeper 5, the probe for keeper
    // 1 finds nothing, and the cluster SPLITS (0,1 relabel; 5,9 stranded)
    val got = labs(IncrementalCc.mergePairs(
      Seq((0L, 1L)).toDF("a_id", "b_id"), store))
    val want = labs(Dedup.connectedComponents(
      Seq((5L, 9L), (30L, 31L), (1L, 5L), (0L, 1L)).toDF("a_id", "b_id")))
    assert(got == want, s"$got vs $want")
    assert(Set(1L, 5L, 9L).forall(got(_) == 0L), s"$got")
  }

  test("a sparse all-new-nodes fold cannot hide the crash window (unconditional pin audit)") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_sparse_heal").toString + "/store"
    // normal fold: clusters {5,9} keeper 5, {30,31} keeper 30 (index in sync)
    IncrementalCc.mergePairs(
      Seq((5L, 9L), (30L, 31L)).toDF("a_id", "b_id"), store).count()
    // crash window: a label merge COMMITS (node 1 joins {5,9}, relabeling
    // to keeper 1) but the member-index merge is lost
    KeyedStore.merge(
      Seq((1L, 1L, 2L, "put"), (5L, 1L, 2L, "put"), (9L, 1L, 2L, "put"))
        .toDF("doc_id", "keeper_id", "ver", "op_type"),
      store, keys = Seq("doc_id"), seqCols = Seq("ver"),
      numBuckets = 4, bucketCols = Seq("doc_id"))
    // the dangerous interleaving: an ALL-NEW-NODES fold (no affected
    // keepers, member read skipped) lands next. Before the fix it re-pinned
    // ngen = nextVer without looking, permanently masking the stale index;
    // now it must audit the pin and rebuild first.
    IncrementalCc.mergePairs(Seq((100L, 101L)).toDF("a_id", "b_id"), store)
      .count()
    // a later fold touching the stale cluster must see the FULL member list
    val got = labs(IncrementalCc.mergePairs(
      Seq((0L, 1L)).toDF("a_id", "b_id"), store))
    val want = labs(Dedup.connectedComponents(
      Seq((5L, 9L), (30L, 31L), (1L, 5L), (100L, 101L), (0L, 1L))
        .toDF("a_id", "b_id")))
    assert(got == want, s"$got vs $want")
    assert(Set(1L, 5L, 9L).forall(got(_) == 0L),
      s"stale member index split the cluster: $got")
  }

  test("member-index compaction (tombstones dropped) leaves folds exact") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_cp").toString + "/store"
    // two clusters, then a merge that writes tombstones into the index
    // (5 and 9 move from keeper 5 to keeper 1)
    IncrementalCc.mergePairs(
      Seq((5L, 9L), (30L, 31L)).toDF("a_id", "b_id"), store).count()
    IncrementalCc.mergePairs(Seq((1L, 5L)).toDF("a_id", "b_id"), store).count()
    val before = KeyedStore.read(s, store + "__members").get
    assert(before.filter(col("op_type") === "delete").count() == 2)
    KeyedStore.compact(s, store + "__members", dropTombstones = true)
    val after = KeyedStore.read(s, store + "__members").get
    assert(after.filter(col("op_type") === "delete").count() == 0)
    // a fold touching the compacted cluster still sees every member
    val got = labs(IncrementalCc.mergePairs(
      Seq((0L, 1L)).toDF("a_id", "b_id"), store))
    val want = labs(Dedup.connectedComponents(
      Seq((5L, 9L), (30L, 31L), (1L, 5L), (0L, 1L)).toDF("a_id", "b_id")))
    assert(got == want, s"$got vs $want")
  }

  test("member-index auto-maintenance: a merge-heavy chain compacts itself; folds stay exact") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_mt").toString + "/store"
    // 16 chain folds, each adding a smaller node and relabeling the whole
    // cluster: tombstones pile up under every superseded keeper, so by the
    // cadence generation (16) the index is tombstone-heavy and maintain
    // fires inside mergePairs — no manual OPTIMIZE call anywhere
    var history = Seq.empty[(Long, Long)]
    for (i <- 0 until 16) {
      val p = (99L - i, 100L - i)
      history +:= p
      IncrementalCc.mergePairs(Seq(p).toDF("a_id", "b_id"), store).count()
    }
    val mp = store + "__members"
    assert(KeyedStore.read(s, mp).get
      .filter(col("op_type") === "delete").count() == 0,
      "auto-maintenance did not compact the tombstone-heavy member index")
    // the compacted index still serves exact folds (meta pin survived)
    val got = labs(IncrementalCc.mergePairs(
      Seq((50L, 84L)).toDF("a_id", "b_id"), store))
    val want = labs(Dedup.connectedComponents(
      ((50L, 84L) +: history).toDF("a_id", "b_id")))
    assert(got == want, s"$got vs $want")
  }

  test("deleteNodes: splits, keeper moves, singletons, idempotence, and later folds stay exact") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_del").toString + "/store"
    // one chain cluster 1-2-3-4-5 (keeper 1), one pair cluster 10-11,
    // and one untouched cluster 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L))
    IncrementalCc.mergePairs(pairs.toDF("a_id", "b_id"), store).count()
    // erase 3 (splits the chain: {1,2} and {4,5}), 10 (keeper of {10,11}
    // moves to 11), and 21 (isolates 20 as a singleton)
    val del = Seq(3L, 10L, 21L).toDF("doc_id")
    val surv = pairs.toDF("a_id", "b_id")
      .filter(!col("a_id").isin(3L, 10L, 21L) &&
        !col("b_id").isin(3L, 10L, 21L))
    val got = labs(IncrementalCc.deleteNodes(del, surv, store))
    val want = Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, 11L -> 11L,
      20L -> 20L)
    assert(got == want, s"$got vs $want")
    // IDEMPOTENT set-removal: re-deleting the same nodes is a silent no-op
    val again = labs(IncrementalCc.deleteNodes(del, surv, store))
    assert(again == got)
    // the repaired store keeps folding exactly: a new pair re-bridges the
    // split halves, and the result equals batch components over the FULL
    // surviving history plus the new pair
    val got2 = labs(IncrementalCc.mergePairs(
      Seq((2L, 4L)).toDF("a_id", "b_id"), store))
    // batch components over the full surviving history plus the new
    // pair, plus the singletons the new pair does not reach
    val want2 = labs(Dedup.connectedComponents(
      surv.unionByName(Seq((2L, 4L)).toDF("a_id", "b_id")))) ++
      Map(11L -> 11L, 20L -> 20L)
    assert(got2 == want2, s"$got2 vs $want2")
    // an erased node may be re-ingested later: it rejoins as a new node
    val got3 = labs(IncrementalCc.mergePairs(
      Seq((3L, 5L)).toDF("a_id", "b_id"), store))
    assert(got3(3L) == got3(5L))
  }

  test("a no-merge fold writes nothing new for existing nodes") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("inc_cc_nm").toString + "/store"
    IncrementalCc.mergePairs(Seq((1L, 2L)).toDF("a_id", "b_id"), store).count()
    val v0 = KeyedStore.read(s, store).get
      .agg(max(col("ver"))).head().getLong(0)
    // same pair again: no label changes -> no new generation rows for 1/2
    IncrementalCc.mergePairs(Seq((1L, 2L)).toDF("a_id", "b_id"), store).count()
    val live = KeyedStore.read(s, store).get
    assert(live.count() == 2)
    assert(live.agg(max(col("ver"))).head().getLong(0) == v0,
      "an all-stable fold must not rewrite label rows")
  }
}

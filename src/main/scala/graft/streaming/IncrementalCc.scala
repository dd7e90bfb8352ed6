package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch connected components — the missing link of the continuous
  * dedup chain: [[IncrementalLsh]] surfaces near-dup PAIRS as batches
  * arrive, and keeper assignment needs the pairs' transitive closure over
  * EVERYTHING seen so far. Recomputing components over the full
  * accumulated pair log grows without bound; this operator instead
  * persists the LABEL TABLE (node → cluster keeper, O(nodes) rows) and
  * folds each batch by running components over `new pairs ∪ STAR EDGES`
  * (one node→keeper edge per member of each AFFECTED cluster — a cluster
  * no batch node touches cannot change, so its labels pass through
  * without entering the components run at all). Star edges preserve
  * every old cluster's connectivity at diameter ≤ 2, so each fold's
  * pointer-jumping depth is ~log of the NEW merge chain only — the
  * warm-start payoff — while the result is provably identical to the
  * batch operator over the concatenated pair history: min-label over the
  * merged component sees every member node through its star edge, and
  * every historical keeper IS its old cluster's minimum.
  *
  * Folds are IDEMPOTENT by construction (components are a pure function
  * of the edge set, and re-adding pairs or star edges changes nothing),
  * so no replay high-water mark is needed — the [[IncrementalBloom]]
  * stance, not the counting sketches'. Only CHANGED label rows are
  * written per fold (new nodes + members of clusters that merged).
  *
  * Same output contract as `ext/Dedup.connectedComponents`:
  * (doc_id, keeper_id), keeper = the cluster's minimum doc_id ever seen. */
object IncrementalCc {

  /** Fold one batch of undirected near-dup pairs (a_id, b_id) into the
    * label store at `storePath` (created on first use) and return the
    * FULL updated label table. */
  def mergePairs(pairs: DataFrame, storePath: String,
      numBuckets: Int = 4): DataFrame = {
    val spark = pairs.sparkSession
    val stored = KeyedStore.read(spark, storePath)
      .map(_.select(col("doc_id"), col("keeper_id"), col("ver"))
        .localCheckpoint(true))
    val batch = pairs.select(col("a_id"), col("b_id")).localCheckpoint(true)
    // AFFECTED-CLUSTER pruning: a stored cluster with no batch node among
    // its members cannot gain or lose connectivity from the new pairs
    // (every new edge ends on a batch node, and star edges are internal) —
    // so components re-run only over `batch ∪ star edges of clusters a
    // batch node touches`, and every other label passes through verbatim.
    // The fold's input is O(batch + affected members), not O(all nodes):
    // the sparse-delta regime a long-running stream lives in costs per
    // DELTA, not per corpus (ccfold probe, sparse phase).
    val (edges, untouched) = stored match {
      case Some(s) =>
        val batchNodes = batch.select(col("a_id").as("node"))
          .unionByName(batch.select(col("b_id").as("node"))).distinct()
        val affKeepers = s.join(batchNodes, col("doc_id") === col("node"))
          .select(col("keeper_id")).distinct().localCheckpoint(true)
        val aff = s.join(affKeepers, Seq("keeper_id"), "left_semi")
        val e = batch.unionByName(
          aff.filter(col("doc_id") =!= col("keeper_id"))
            .select(col("doc_id").as("a_id"), col("keeper_id").as("b_id")))
        (e, Some(affKeepers))
      case None => (batch, None)
    }
    // the union's old-cluster side has diameter <= 2 by construction, so
    // the double-pointer-jumping depth tracks the new merges, not history
    val labels = graft.ext.Dedup.connectedComponents(edges)
      .localCheckpoint(true)
    val nextVer = stored
      .flatMap(s => Option(s.agg(max(col("ver"))).head().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    // write only rows that are new or re-labeled — a fold that merges
    // nothing touches nothing (untouched clusters never even compare)
    val changed = (stored match {
      case Some(s) => labels.join(
        s.select(col("doc_id"), col("keeper_id").as("__old")),
        Seq("doc_id"), "left_outer")
        .filter(col("__old").isNull || col("__old") =!= col("keeper_id"))
        .select(col("doc_id"), col("keeper_id"))
      case None => labels
    }).localCheckpoint(true) // pin BEFORE the merge mutates the store
    if (!changed.isEmpty)
      KeyedStore.merge(changed.withColumn("ver", lit(nextVer)), storePath,
        keys = Seq("doc_id"), seqCols = Seq("ver"), numBuckets = numBuckets,
        bucketCols = Seq("doc_id"))
    graft.util.Blocks.freeCheckpoint(changed)
    // the full updated table is a LAZY fresh store read: the pruned
    // components output `labels` only covers affected + new nodes, and
    // unioning it with the untouched remainder would put the same store
    // attributes on both Union branches (Catalyst's constraint rewrite
    // rejects duplicate ids across branches). The merge above already
    // holds every row such a union would produce; returning the lazy
    // read keeps a sparse fold's own cost delta-sized — callers that
    // outlive the store (or delete it) checkpoint at the call site.
    untouched.foreach(graft.util.Blocks.freeCheckpoint)
    graft.util.Blocks.freeCheckpoint(labels)
    stored.foreach(graft.util.Blocks.freeCheckpoint)
    graft.util.Blocks.freeCheckpoint(batch)
    readLabels(spark, storePath)
  }

  /** The stored label table without folding (empty frame if never run). */
  def readLabels(spark: SparkSession, storePath: String): DataFrame =
    KeyedStore.read(spark, storePath)
      .map(_.select(col("doc_id"), col("keeper_id")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("doc_id", "keeper_id")
      }
}

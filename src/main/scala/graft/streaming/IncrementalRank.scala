package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch PageRank for a GROWING graph — a webscale curation pipeline
  * re-ranks as the crawl grows, but rank does not fold like a sketch: the
  * fixed point over the new graph genuinely differs everywhere. What CAN
  * carry over is the iteration count: the damped update is a contraction,
  * so warm-starting from the previous graph's fixed point after a small
  * edge delta converges in a small number of iterations (SCALING.md
  * records the measured saving) while a cold start pays the full depth
  * every time. This operator persists exactly the two things that enable
  * that: the accumulated edge table and the last converged rank vector,
  * both in [[KeyedStore]]s under one root.
  *
  * Deltas are ADDITIVE (new edges — the crawl-growth shape; edge deletion
  * would need tombstone rows and re-derived degrees, out of scope and
  * documented). Folding the same delta twice is harmless: edge rows merge
  * by (src, dst) key, and the rank re-converges from its own fixed point
  * in one checking iteration.
  *
  * Per-update cost: one edge merge touching the delta's buckets, one full
  * edge-table read (the iteration reads it anyway), and the warm-started
  * [[graft.ops.Graph.pageRankIntConverge]] run — each iteration the
  * canonical Pregel join+agg, node-sized state, per-iteration checkpoints
  * freed. */
object IncrementalRank {

  private def edgePath(root: String) = s"$root/edges"
  private def rankPath(root: String) = s"$root/ranks"

  /** Merge `edgeDelta` (src, dst) into the stored graph, re-rank from the
    * stored vector (warm start; uniform on first use), persist the new
    * vector, and return it with the iteration count the convergence run
    * actually needed. */
  def updateAndRank(edgeDelta: DataFrame, storeRoot: String, tol: Long,
      maxIters: Int, unit: Long = 1000000000L, dampNum: Long = 85,
      dampDen: Long = 100, numBuckets: Int = 4): (DataFrame, Int) = {
    val spark = edgeDelta.sparkSession
    val delta = edgeDelta.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    if (!delta.isEmpty)
      KeyedStore.merge(delta.withColumn("ver", lit(0L)), edgePath(storeRoot),
        keys = Seq("src", "dst"), seqCols = Seq("ver"),
        numBuckets = numBuckets, bucketCols = Seq("src"))
    val edges = KeyedStore.read(spark, edgePath(storeRoot))
      .map(_.select(col("src"), col("dst")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("src", "dst")
      }
    // no tombstones are ever written (additive deltas), so no op_type here
    val stored = KeyedStore.read(spark, rankPath(storeRoot))
      .map(_.select(col("node"), col("rank_fp"), col("ver"))
        .localCheckpoint(true))
    val start = stored.map(_.select(col("node"), col("rank_fp")))
    // the store's seq must be a TOTAL order over re-written keys (same
    // node, new rank) — derive the next version from the stored max, so
    // every update strictly supersedes the last without the caller
    // threading a batch id
    val nextVer = stored
      .flatMap(s => Option(s.agg(max(col("ver"))).head().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    val (ranks, iters) = graft.ops.Graph.pageRankIntConverge(
      edges, start, tol, maxIters, unit, dampNum, dampDen)
    // node-sized upsert; departed nodes can't exist under additive deltas,
    // so no tombstones — every live node gets its fresh value
    val pinned = ranks.localCheckpoint(true)
    stored.foreach(graft.util.Blocks.freeCheckpoint)
    if (!pinned.isEmpty)
      KeyedStore.merge(pinned.withColumn("ver", lit(nextVer)),
        rankPath(storeRoot), keys = Seq("node"), seqCols = Seq("ver"),
        numBuckets = numBuckets, bucketCols = Seq("node"))
    (pinned, iters)
  }

  /** The stored rank vector without updating (empty frame if never run). */
  def readRanks(spark: SparkSession, storeRoot: String): DataFrame =
    KeyedStore.read(spark, rankPath(storeRoot))
      .map(_.select(col("node"), col("rank_fp")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("node", "rank_fp")
      }
}

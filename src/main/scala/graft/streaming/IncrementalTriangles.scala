package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming triangle maintenance — `ops/Graph.triangleCounts` for a graph
  * that arrives as edge batches (the near-dup pair stream, a growing link
  * graph): a persistent EDGE store plus a persistent per-node COUNT table,
  * folded per batch by counting only the triangles the batch CLOSES.
  *
  * The increment is exact and double-count-free by an assignment
  * argument: every triangle of the grown graph either existed before
  * (counted in an earlier fold) or contains ≥ 1 new edge, and each new
  * triangle is counted exactly once — at its LEXICOGRAPHICALLY-LARGEST
  * new edge (for new edge e = (u, v), wedges u–w–v qualify only if each
  * leg is stored, or new-but-strictly-smaller than e). Per-node counts
  * then fold ADDITIVELY (each triangle credits its three vertices), so at
  * every horizon the count table is bit-identical to the batch operator
  * over all edges ever folded — verified transitively against
  * `q_triangles`' hash-proven contract in IncrementalTrianglesSpec.
  *
  * Per-fold cost: the batch joins the stored adjacency twice (wedge build
  * + closure legs) — O(Σ_e deg(u) + deg(v)) over batch edges, never a
  * recount of the whole graph; the count upsert touches only credited
  * nodes. Replay safety is the counting contract: a meta row on the
  * count store records the high-water mark; a replayed fold returns
  * current counts untouched.
  *
  * State: the edge set (the graph itself — irreducible for exact
  * maintenance) + O(nodes) counts. */
object IncrementalTriangles {

  private def edgePath(root: String) = s"$root/edges"
  private def countPath(root: String) = s"$root/counts"

  private def liveCounts(spark: SparkSession, root: String): DataFrame =
    KeyedStore.read(spark, countPath(root))
      .map(_.filter(col("op_type") =!= "delete")
        .select(col("kind"), col("node"), col("tri_ct"), col("ver")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, Long, Long, Long)]
          .toDF("kind", "node", "tri_ct", "ver")
      }

  /** Fold one batch of undirected edges (a, b) into the stores at
    * `storeRoot` and return the updated per-node triangle counts
    * (node, tri_ct) over every edge folded so far. */
  def mergeEdges(batch: DataFrame, storeRoot: String, batchId: Long,
      numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val counts = liveCounts(spark, storeRoot).localCheckpoint(true)
    val meta = counts.filter(col("kind") === "m").select(col("ver")).collect()
    val cur = counts.filter(col("kind") === "v")
      .select(col("node"), col("tri_ct"))
    if (meta.exists(m => batchId <= m.getLong(0))) {
      val out = cur.localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(counts)
      return out
    }
    // CRASH SAFETY across the two stores: edge rows carry their fold's
    // ver, and `fresh` is derived against STRICTLY-OLDER edges only. A
    // crash between the edge merge and the count merge leaves this
    // batch's edges persisted at ver == batchId with the count HWM not
    // advanced; the replay then re-derives the identical fresh set from
    // the batch argument (ignoring the ver == batchId leftovers), re-runs
    // the same increment, and the idempotent edge re-merge rewrites the
    // same rows — no triangle is ever lost or double-credited.
    val stored = KeyedStore.read(spark, edgePath(storeRoot))
      .map(_.filter(col("ver") < batchId && col("op_type") =!= "delete")
        .select(col("u"), col("v")))
    val canon = batch.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // only edges the graph lacks can close new triangles
    val fresh = (stored match {
      case Some(s) => canon.join(s, Seq("u", "v"), "left_anti")
      case None => canon
    }).localCheckpoint(true)
    // adjacency of the GROWN graph, both directions, with each edge's
    // (new?, canonical key) for the largest-new-edge assignment
    val all = (stored match {
      case Some(s) => s.withColumn("is_new", lit(false)).unionByName(
        fresh.withColumn("is_new", lit(true)))
      case None => fresh.withColumn("is_new", lit(true))
    }).withColumn("key", struct(col("u"), col("v")))
    val adj = all.select(col("u").as("x"), col("v").as("y"),
        col("is_new"), col("key"))
      .unionByName(all.select(col("v").as("x"), col("u").as("y"),
        col("is_new"), col("key")))
    val e = fresh.withColumn("ekey", struct(col("u"), col("v")))
    def leg(side: String) = adj.select(
      col("x").as(s"${side}_x"), col("y").as(s"${side}_y"),
      col("is_new").as(s"${side}_new"), col("key").as(s"${side}_key"))
    val tri = e
      .join(leg("l1"), col("l1_x") === col("u"))
      .join(leg("l2"),
        col("l2_x") === col("v") && col("l2_y") === col("l1_y"))
      .filter((!col("l1_new") || col("l1_key") < col("ekey")) &&
        (!col("l2_new") || col("l2_key") < col("ekey")))
      .select(col("u"), col("v"), col("l1_y").as("w"))
    val credits = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("credit"))
    val changed = credits
      .join(cur, Seq("node"), "left_outer")
      .select(lit("v").as("kind"), col("node"),
        (coalesce(col("tri_ct"), lit(0L)) + col("credit")).as("tri_ct"),
        lit(batchId).as("ver"), lit("put").as("op_type"))
      .localCheckpoint(true) // pin BEFORE the merges mutate the stores
    KeyedStore.merge(
      fresh.withColumn("ver", lit(batchId)).withColumn("op_type", lit("put")),
      edgePath(storeRoot), keys = Seq("u", "v"), seqCols = Seq("ver"),
      numBuckets = numBuckets)
    val metaRow = spark.range(1).select(lit("m").as("kind"),
      lit(-1L).as("node"), lit(0L).as("tri_ct"), lit(batchId).as("ver"),
      lit("put").as("op_type"))
    KeyedStore.merge(changed.unionByName(metaRow), countPath(storeRoot),
      keys = Seq("kind", "node"), seqCols = Seq("ver"),
      numBuckets = numBuckets)
    val out = cur.join(changed.select(col("node")), Seq("node"), "left_anti")
      .unionByName(changed.select(col("node"), col("tri_ct")))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(counts)
    graft.util.Blocks.freeCheckpoint(fresh)
    graft.util.Blocks.freeCheckpoint(changed)
    out
  }

  /** Fold one batch of edge DELETIONS (a, b) into the stores at
    * `storeRoot` — the CDC world's other half (reference dims take
    * op = 'd'): tombstone the removed edges and UN-COUNT exactly the
    * triangles they destroy, returning the updated per-node counts.
    *
    * The decrement mirrors [[mergeEdges]]' assignment argument: every
    * destroyed triangle existed before this fold and contains ≥ 1
    * removed edge, and each is debited exactly once — at its
    * lexicographically-largest REMOVED edge (for removed e = (u, v),
    * wedges u–w–v qualify only if each leg survives, or is
    * removed-but-strictly-smaller than e). Nodes whose count reaches 0
    * are tombstoned (the batch operator over the surviving edge set
    * never lists them). Requests for edges not currently live are
    * ignored; `batchId` shares [[mergeEdges]]' high-water sequence (one
    * monotone caller sequence across adds and deletes).
    *
    * Crash safety mirrors the add path: deletes derive the PRE-deletion
    * adjacency as `strictly-older live edges ∪ this fold's own
    * tombstones` — a tombstone committed at `ver == batchId` replaced an
    * edge that was live before this fold (the live-only filter above
    * guarantees tombstones are only ever written over live edges), so a
    * replay after a crash between the two merges reconstructs the same
    * removed set and the same debits. */
  def deleteEdges(batch: DataFrame, storeRoot: String, batchId: Long,
      numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val counts = liveCounts(spark, storeRoot).localCheckpoint(true)
    val meta = counts.filter(col("kind") === "m").select(col("ver")).collect()
    val cur = counts.filter(col("kind") === "v")
      .select(col("node"), col("tri_ct"))
    if (meta.exists(m => batchId <= m.getLong(0))) {
      val out = cur.localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(counts)
      return out
    }
    val pre = KeyedStore.read(spark, edgePath(storeRoot))
      .map(_.filter(
          (col("ver") < batchId && col("op_type") =!= "delete") ||
          (col("ver") === batchId && col("op_type") === "delete"))
        .select(col("u"), col("v")))
    val canon = batch.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // only live edges can be removed (and thus destroy triangles)
    val rm = (pre match {
      case Some(p) => canon.join(p, Seq("u", "v"), "left_semi")
      case None => canon.limit(0)
    }).localCheckpoint(true)
    // pre-deletion adjacency, each edge flagged removed-or-surviving
    val all = pre.getOrElse(rm)
      .join(rm.withColumn("__rm", lit(true)), Seq("u", "v"), "left_outer")
      .select(col("u"), col("v"),
        coalesce(col("__rm"), lit(false)).as("is_rm"),
        struct(col("u"), col("v")).as("key"))
    val adj = all.select(col("u").as("x"), col("v").as("y"),
        col("is_rm"), col("key"))
      .unionByName(all.select(col("v").as("x"), col("u").as("y"),
        col("is_rm"), col("key")))
    val e = rm.withColumn("ekey", struct(col("u"), col("v")))
    def leg(side: String) = adj.select(
      col("x").as(s"${side}_x"), col("y").as(s"${side}_y"),
      col("is_rm").as(s"${side}_rm"), col("key").as(s"${side}_key"))
    val tri = e
      .join(leg("l1"), col("l1_x") === col("u"))
      .join(leg("l2"),
        col("l2_x") === col("v") && col("l2_y") === col("l1_y"))
      .filter((!col("l1_rm") || col("l1_key") < col("ekey")) &&
        (!col("l2_rm") || col("l2_key") < col("ekey")))
      .select(col("u"), col("v"), col("l1_y").as("w"))
    val debits = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("debit"))
    val changed = debits
      .join(cur, Seq("node"), "left_outer")
      .select(lit("v").as("kind"), col("node"),
        (coalesce(col("tri_ct"), lit(0L)) - col("debit")).as("tri_ct"),
        lit(batchId).as("ver"),
        when(coalesce(col("tri_ct"), lit(0L)) - col("debit") <= 0,
          lit("delete")).otherwise(lit("put")).as("op_type"))
      .localCheckpoint(true) // pin BEFORE the merges mutate the stores
    KeyedStore.merge(
      rm.withColumn("ver", lit(batchId)).withColumn("op_type", lit("delete")),
      edgePath(storeRoot), keys = Seq("u", "v"), seqCols = Seq("ver"),
      numBuckets = numBuckets)
    val metaRow = spark.range(1).select(lit("m").as("kind"),
      lit(-1L).as("node"), lit(0L).as("tri_ct"), lit(batchId).as("ver"),
      lit("put").as("op_type"))
    KeyedStore.merge(changed.unionByName(metaRow), countPath(storeRoot),
      keys = Seq("kind", "node"), seqCols = Seq("ver"),
      numBuckets = numBuckets)
    val out = cur.join(changed.select(col("node")), Seq("node"), "left_anti")
      .unionByName(changed.filter(col("op_type") === "put")
        .select(col("node"), col("tri_ct")))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(counts)
    graft.util.Blocks.freeCheckpoint(rm)
    graft.util.Blocks.freeCheckpoint(changed)
    out
  }

  /** The current per-node counts without folding (nodes with ≥ 1
    * triangle; zero-count nodes are representable but never written). */
  def readCounts(spark: SparkSession, storeRoot: String): DataFrame =
    liveCounts(spark, storeRoot).filter(col("kind") === "v")
      .select(col("node"), col("tri_ct"))
}

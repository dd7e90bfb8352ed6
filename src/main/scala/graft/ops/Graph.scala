package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link-graph analytics. The first member is PageRank — in a
  * training-data pipeline this is the host/domain-graph quality signal web
  * corpora are weighted by (a page linked from many well-linked hosts is
  * crawl-prioritized and quality-boosted; the Common Crawl curation
  * literature uses harmonic/PageRank centrality exactly this way), the same
  * role the DIM layer's config-driven weights play for the reference's
  * warehouse rows.
  *
  * Numeric posture: ranks are FIXED-POINT integers (units of `1/unit`), and
  * every update is integer arithmetic — `r div out_degree` contributions,
  * `(dampNum * Σ contrib) div dampDen` damping — so the result is
  * bit-identical on every engine and partitioning, and the oracle twin
  * ([[pageRankSql]]) replays it with DuckDB's `//` floor division (all
  * values are non-negative, where floor = truncate = Spark's `div`).
  * The float 0.85-damped iteration differs from this by bounded rounding
  * (≤ out_degree per node per step in rank units) but is
  * partition-order-dependent; fixed-point is the deterministic twin.
  */
object Graph {

  /** `iters` synchronous PageRank iterations over `edges` (src, dst), all
    * integer. Every node starts at `unit`; each step a node keeps the
    * teleport base `(unit · (dampDen − dampNum)) div dampDen` and receives
    * `dampNum/dampDen` of the rank its in-neighbors spread equally over
    * their out-edges.
    *
    * Dangling nodes (no out-edges) RETAIN their teleport base but their
    * rank mass leaks from the system instead of redistributing — the usual
    * simplification when the graph is made (or known) dangling-free
    * upstream, e.g. by symmetrizing edges; callers needing the
    * mass-conserving variant add a dangling-sum broadcast term per step.
    *
    * Overflow: `dampNum · Σ in-contrib` must fit a Long. Σ in-contrib is
    * bounded by the total system mass n·unit, so the guard is
    * `n · unit ≤ Long.Max / dampNum` — checked here against the profiled
    * node count (the count rides on the degree aggregate, not an extra
    * corpus pass).
    *
    * Shape at scale: per iteration, one join of the rank table to `edges`
    * on src (rank table is node-sized — broadcast when dims allow,
    * shuffle-join on src otherwise) and one groupBy dst with map-side
    * combine — the canonical Pregel plan. Each iteration's rank table is
    * localCheckpointed: iteration i+1 reads a materialized node-sized
    * table, not i compounding plans (lineage growth is what kills iterative
    * DataFrame jobs at depth).
    *
    * @param edges (src, dst) rows, both castable to long; parallel edges
    *   count once per occurrence (pre-`distinct` upstream if unwanted)
    * @return (node, rank_fp) — rank in fixed-point `1/unit` units */
  def pageRankInt(edges: DataFrame, iters: Int, unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // tol = None disables the convergence check entirely, so this IS the
    // fixed-iteration operator — parity with the converge form is by
    // construction (one shared core), not by parallel copies
    pageRankCore(edges, None, None, iters, unit, dampNum, dampDen)._1
  }

  /** [[pageRankInt]] with a WARM-START vector and a convergence stop — the
    * form an INCREMENTAL ranking pipeline iterates
    * ([[graft.streaming.IncrementalRank]]): rank does not fold like a
    * sketch, but the damped iteration is a contraction, so restarting from
    * the PREVIOUS graph's fixed point after a small edge delta converges
    * in far fewer iterations than from uniform (measured in SCALING.md).
    *
    * `start` rows (node, rank_fp) seed matching nodes; nodes absent from
    * `start` (new since the last run) begin at `unit`, rows for departed
    * nodes are dropped by the spine join. Iteration stops when the max
    * per-node |Δrank| ≤ `tol` fixed-point units (checked each step with
    * one extra node-sized join+agg — the price of knowing when to stop),
    * or after `maxIters`. Same integer arithmetic, checkpoint discipline,
    * and overflow guard as [[pageRankInt]]; with `start = None` the
    * iterates are IDENTICAL to [[pageRankInt]]'s at every step.
    *
    * @return (ranks(node, rank_fp), iterations actually run) */
  def pageRankIntConverge(edges: DataFrame, start: Option[DataFrame],
      tol: Long, maxIters: Int, unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): (DataFrame, Int) = {
    require(tol >= 0, s"tol must be >= 0, got $tol")
    pageRankCore(edges, start, Some(tol), maxIters, unit, dampNum, dampDen)
  }

  /** [[pageRankInt]] over WEIGHTED edges (src, dst, w), w ≥ 1 integer:
    * each node spreads rank proportionally to edge weight —
    * `contribution = (r · w) div Σw_out` — the natural pairing with
    * [[projectBipartite]]'s shared-hub weights (a supplier pair sharing
    * five customers pulls 5× the rank of a single-customer pair). Same
    * fixed-point integer arithmetic, checkpoint discipline, and Pregel
    * shape as the unweighted form — in fact the SAME loop: unweighted
    * callers run it with w = 1, where the formula reduces exactly.
    * Overflow guard extends to the edge product: `n · unit · max(w) ≤
    * Long.Max / dampNum`. The twin generator is [[pageRankWSql]]. */
  def pageRankIntW(edges: DataFrame, iters: Int, unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    pageRankCore(edges, None, None, iters, unit, dampNum, dampDen,
      weighted = true)._1
  }

  /** The one PageRank loop both public forms delegate to. `tol = None`
    * disables the convergence delta check (no extra per-iteration join)
    * and loops exactly `maxIters` times — [[pageRankInt]]'s contract;
    * `Some(tol)` adds the node-sized delta join+agg per iteration and
    * stops early — [[pageRankIntConverge]]'s. */
  private def pageRankCore(edges: DataFrame, start: Option[DataFrame],
      tol: Option[Long], maxIters: Int, unit: Long, dampNum: Long,
      dampDen: Long, weighted: Boolean = false): (DataFrame, Int) = {
    require(maxIters >= 0, s"iters must be >= 0, got $maxIters")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    require(dampNum >= 0 && dampDen >= 1 && dampNum <= dampDen,
      s"damping must be a fraction in [0, 1], got $dampNum/$dampDen")
    // pin the edge table once: it feeds every iteration's join plus the
    // node and degree builds, and an upstream edge DERIVATION (a join +
    // distinct, typically) would otherwise re-execute once per consumer —
    // measured 3x the whole query's scan cost at iters = 3.
    // The unweighted path carries w = 1, under which every weighted
    // expression below reduces EXACTLY to the original integer formula
    // ((r·1) div Σ1 = r div d) — one shared loop, no parallel copies.
    val e = (if (weighted)
        edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      else edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).withColumn("w", lit(1L)))
      .localCheckpoint(true)
    // node spine with the out-WEIGHT folded in (null for dangling nodes —
    // the weight is only ever read through the e.src join, which dangling
    // nodes never match): each iteration then needs ONE rank join, not a
    // separate degree join
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(e.groupBy(col("src").as("node")).agg(sum(col("w")).as("d")),
        Seq("node"), "left_outer")
      .localCheckpoint(true)
    val n = nodes.count()
    val maxW = if (!weighted || n == 0) 1L else {
      // count nulls explicitly: min/max skip them, so a null weight would
      // otherwise pass the >= 1 gate and then silently contribute NOTHING
      // (null products vanish from the sum) instead of failing fast
      val mm = e.agg(min(col("w")), max(col("w")),
        count(when(col("w").isNull, lit(1)))).head()
      require(mm.getLong(2) == 0L,
        s"edge weights must be >= 1, got ${mm.getLong(2)} null weight(s)")
      require(mm.getLong(0) >= 1L,
        s"edge weights must be >= 1, got min ${mm.getLong(0)}")
      mm.getLong(1)
    }
    // dampNum = 0 (pure teleport) is a valid dial with nothing to
    // overflow: the damped product is 0 · m regardless of m, so even a
    // wrapped contribution sum cannot reach a rank — guard only the real
    // damped path, and never divide by zero doing it
    require(n == 0 || dampNum == 0 ||
        unit <= Long.MaxValue / dampNum / n / maxW,
      s"n=$n nodes at unit=$unit can overflow Long under dampNum=$dampNum" +
        s", maxW=$maxW — lower unit (the guard is " +
        "n * unit * maxW <= Long.Max / dampNum)")
    val base = unit * (dampDen - dampNum) / dampDen
    // r0 is its own checkpoint in both branches, so every superseded rank
    // table (r0 included) may be freed, and the node spine is only ever
    // read through checkpointed generations
    var r = start match {
      case Some(s0) => nodes
        .join(s0.select(col("node").cast("long").as("node"),
          col("rank_fp").as("__r0")), Seq("node"), "left_outer")
        .select(col("node"), col("d"),
          coalesce(col("__r0"), lit(unit)).as("r"))
        .localCheckpoint(true)
      case None => nodes.withColumn("r", lit(unit)).localCheckpoint(true)
    }
    var itersRun = 0
    var converged = false
    while (itersRun < maxIters && !converged) {
      val contrib = e
        .join(r.select(col("node").as("src"), col("d"), col("r")), "src")
        .select(col("dst").as("node"), expr("(r * w) div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      val prev = r
      r = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"), col("d"),
          (lit(base) + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen")).as("r"))
        .localCheckpoint(true)
      itersRun += 1
      // the delta join is the PRICE of knowing when to stop — tol = None
      // (the fixed-iteration form) never pays it
      converged = tol.exists { t =>
        val delta = r.select(col("node"), col("r"))
          .join(prev.select(col("node"), col("r").as("__p")), "node")
          .agg(max(abs(col("r") - col("__p")))).head().get(0)
        delta == null || delta.asInstanceOf[Long] <= t
      }
      graft.util.Blocks.freeCheckpoint(prev)
    }
    graft.util.Blocks.freeCheckpoint(nodes)
    graft.util.Blocks.freeCheckpoint(e)
    (r.select(col("node"), col("r").as("rank_fp")), itersRun)
  }

  /** PERSONALIZED PageRank (TrustRank, Gyöngyi et al. VLDB'04): teleport
    * mass lands ONLY on the `seeds` nodes — trust propagates outward from a
    * curated seed list (known-good domains, hand-audited hosts) through the
    * link structure, the standard web-corpus trust/spam-demotion signal.
    * Same fixed-point integer arithmetic as [[pageRankInt]]: seeds start at
    * `unit` and keep the teleport base each step, non-seeds start at 0 and
    * accumulate only propagated mass; nodes unreachable from any seed stay
    * at exactly 0 — the defining TrustRank property, bit-exact here.
    * Dangling-leak and overflow posture are [[pageRankInt]]'s.
    *
    * @param seeds one `node` column; ids not present in the graph are
    *   ignored (they have no edges to propagate through)
    * @return (node, rank_fp) for every graph node */
  def trustRankInt(edges: DataFrame, seeds: DataFrame, iters: Int,
      unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    require(dampNum >= 0 && dampDen >= 1 && dampNum <= dampDen,
      s"damping must be a fraction in [0, 1], got $dampNum/$dampDen")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val sd = seeds.select(col("node").cast("long").as("node")).distinct()
    // node spine with degree AND the per-node teleport base folded in
    val base = unit * (dampDen - dampNum) / dampDen
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d")),
        Seq("node"), "left_outer")
      .join(sd.withColumn("__seed", lit(true)), Seq("node"), "left_outer")
      .select(col("node"), col("d"),
        when(col("__seed"), lit(base)).otherwise(lit(0L)).as("sb"),
        when(col("__seed"), lit(unit)).otherwise(lit(0L)).as("r0"))
      .localCheckpoint(true)
    val n = nodes.count()
    require(n == 0 || dampNum == 0 || unit <= Long.MaxValue / dampNum / n,
      s"n=$n nodes at unit=$unit can overflow Long under dampNum=$dampNum " +
        "— lower unit (the guard is n * unit <= Long.Max / dampNum)")
    var r = nodes.select(col("node"), col("d"), col("sb"), col("r0").as("r"))
    var rIsCheckpointed = false
    for (_ <- 0 until iters) {
      val contrib = e
        .join(r.select(col("node").as("src"), col("d"), col("r")), "src")
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      val prev = r
      r = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"), col("d"), col("sb"),
          (col("sb") + expr(s"($dampNum * coalesce(m, 0L)) div $dampDen")).as("r"))
        .localCheckpoint(true)
      if (rIsCheckpointed) graft.util.Blocks.freeCheckpoint(prev)
      rIsCheckpointed = true
    }
    if (iters > 0) graft.util.Blocks.freeCheckpoint(nodes)
    graft.util.Blocks.freeCheckpoint(e)
    r.select(col("node"), col("r").as("rank_fp"))
  }

  /** Deterministic SYNCHRONOUS label propagation (community detection —
    * Raghavan et al. 2007, made engine-reproducible): every node starts
    * labeled with its own id; each iteration every node adopts the label
    * held by the PLURALITY of its in-neighbors (pass a symmetrized edge
    * table for undirected communities), ties broken by the smallest label,
    * nodes with no in-neighbors keeping theirs. Classic LPA is
    * ASYNCHRONOUS and visit-order-dependent — unusable where reruns must
    * agree; the synchronous form with a total tie-break is a pure function
    * of (edges, iters), bit-identical across engines and partitionings
    * (the [[pageRankInt]] determinism stance, minus arithmetic entirely —
    * only counts and order statistics).
    *
    * Shape per iteration (the Pregel shape again): edge scan ⋈ node-sized
    * label table → (node, label)-keyed count (map-side combined) → per-node
    * plurality via a rank window → left join back to the label spine; per-
    * iteration localCheckpoint with superseded tables freed, as PageRank.
    *
    * @return (node, label) — label = community representative id */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var l = nodes.withColumn("label", col("node"))
    var lIsCheckpointed = false
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("node")).orderBy(col("ct").desc, col("label"))
    for (_ <- 0 until iters) {
      val best = e
        .join(l.select(col("node").as("src"), col("label")), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("ct"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("node"), col("label").as("__nl"))
      val prev = l
      l = l.join(best, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("__nl"), col("label")).as("label"))
        .localCheckpoint(true)
      if (lIsCheckpointed) graft.util.Blocks.freeCheckpoint(prev)
      lIsCheckpointed = true
    }
    if (iters > 0) graft.util.Blocks.freeCheckpoint(nodes)
    graft.util.Blocks.freeCheckpoint(e)
    l.select(col("node"), col("label"))
  }

  /** The oriented-triangle pass shared by [[triangleCounts]] and
    * [[trussSupport]]: canonical undirected edges, degrees, and every
    * triangle exactly once as (apex, d1, d2) with apex = its unique
    * (deg, node) minimum and d1 < d2 by node id. `und` and `deg` come
    * back localCheckpointed — the CALLER frees both after consuming
    * `triangles` (which reads them lazily). */
  private def orientedTriangles(edges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val und = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val joined = und
      .join(deg.select(col("node").as("u"), col("deg").as("__du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("__dv")), "v")
    val lowFirst = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val oriented = joined.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
    // wedges at the apex (the triangle's unique (deg, node)-minimum);
    // d1 < d2 by node id makes the closure probe a single equi join
    // against the canonical u < v edge table
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("apex"),
        least(col("e1.dst"), col("e2.dst")).as("d1"),
        greatest(col("e1.dst"), col("e2.dst")).as("d2"))
    val triangles = wedges.join(und,
      col("d1") === col("u") && col("d2") === col("v"))
    (und, deg, triangles)
  }

  /** Per-node triangle counts over an undirected edge table — the local
    * clustering signal (a near-dup pair graph's triangles are its cluster
    * cores; a link graph's triangle density separates organic communities
    * from link farms, the classic TrustRank-adjacent spam feature).
    *
    * Algorithm: DEGREE-ORIENTED wedge counting (the MapReduce-era standard
    * for exactly this skew problem). Each undirected edge is oriented from
    * its lower-(degree, node) endpoint to the higher; every triangle then
    * has exactly ONE vertex with two out-edges (its minimum), so counting
    * wedges at that apex and closing them against the edge set counts each
    * triangle once — no post-hoc dedup, and the wedge fan-out is bounded
    * by Σ min-oriented-out-degree², which is O(m^1.5) on ANY graph (vs
    * Σ degree² for the naive wedge join, which a single celebrity node
    * makes quadratic). The oriented out-degree of a node is at most
    * O(√m) regardless of its real degree — orientation is what makes
    * triangle counting survive skew at web scale.
    *
    * Shape at scale: one distinct + degree aggregate, two broadcast-sized
    * joins of edges to the node-sized degree table, one equi self-join on
    * the apex (the wedge build), one equi join of wedges to the canonical
    * edge table (the closure probe) — all map-side-combinable, no
    * cartesian anywhere. Every step is exact integer arithmetic on the
    * edge SET (direction and duplicates removed first), so the result is
    * a pure function of the graph and hash-oracles.
    *
    * @param edges (a, b) rows, both castable to long; direction, parallel
    *   edges, and self-loops are removed here
    * @return (node, deg, tri_ct) — degree in the simple graph and the
    *   number of triangles the node participates in */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val (und, deg, triangles) = orientedTriangles(edges)
    val perNode = triangles
      .select(explode(array(col("apex"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_ct"))
    val out = deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("deg"),
        coalesce(col("tri_ct"), lit(0L)).as("tri_ct"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(und)
    graft.util.Blocks.freeCheckpoint(deg)
    out
  }

  /** Per-EDGE triangle support over an undirected edge table — the
    * k-truss building block (an edge in a k-truss sits in ≥ k−2
    * triangles; support-0 edges are bridges/tendrils, high-support edges
    * are community cores — the edge-level refinement of
    * [[triangleCounts]]'s node signal, used to peel link farms whose
    * edges triangle-count high at the node but low at the edge).
    *
    * Same degree-oriented plan as [[triangleCounts]] (each triangle found
    * once at its minimum apex, O(m^1.5) wedge bound under any skew); the
    * credit step charges the triangle's THREE EDGES instead of its three
    * vertices. Exact integer output, a pure function of the edge set.
    *
    * @return (u, v, support) — canonical u < v rows for every edge of the
    *   simple graph, support = number of triangles containing it */
  def trussSupport(edges: DataFrame): DataFrame = {
    val (und, deg, triangles) = orientedTriangles(edges)
    // each triangle (apex, d1, d2) charges its three edges, canonical
    val edgeCredits = triangles.select(explode(array(
        struct(least(col("apex"), col("d1")).as("u"),
          greatest(col("apex"), col("d1")).as("v")),
        struct(least(col("apex"), col("d2")).as("u"),
          greatest(col("apex"), col("d2")).as("v")),
        struct(col("d1").as("u"), col("d2").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
    val out = und.join(edgeCredits, Seq("u", "v"), "left_outer")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(und)
    graft.util.Blocks.freeCheckpoint(deg)
    out
  }

  /** `rounds` peeling rounds toward the k-truss: each round recomputes
    * [[trussSupport]] over the surviving edges and drops those in fewer
    * than k−2 triangles — the cohesion-cascade community definition
    * (Cohen 2008). A fixed round count keeps the operator a pure function
    * of (edges, k, rounds) — hash-oracle-able like the other iterative
    * operators — and bounds cost; callers wanting the fixpoint re-run
    * until the edge count stops moving (each round is one oriented
    * triangle pass, and the count is monotone decreasing). Per-round
    * edges are localCheckpointed (the [[pageRankInt]] lineage
    * discipline).
    * @return the surviving (u, v) canonical edges after `rounds` */
  def kTruss(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"a k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val sup = trussSupport(e.select(col("u").as("a"), col("v").as("b")))
      val next = sup.filter(col("support") >= k - 2)
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(sup) // trussSupport checkpoints it
      graft.util.Blocks.freeCheckpoint(e)
      e = next
    }
    e
  }

  /** Hub-capped one-mode projection of a bipartite edge table — how a
    * unipartite graph (for [[pageRankInt]], [[labelPropagation]],
    * [[triangleCounts]], [[kTruss]]) is DERIVED from co-occurrence data
    * (suppliers sharing a customer, docs sharing an author, items sharing
    * a basket): a-nodes sharing a hub h become an edge weighted by the
    * number of shared hubs.
    *
    * The `cap` is the scale lever, not a convenience: a hub of degree d
    * emits C(d, 2) pairs, so one celebrity hub (a basket containing
    * everything, a crawler account) makes the projection quadratic while
    * carrying almost no signal — co-occurrence inside a huge hub is
    * uninformative (TF-IDF's df argument, graph-side). Hubs with degree
    * > cap are DROPPED, bounding output (and the self-join's work) at
    * |hubs| · C(cap, 2) regardless of the degree distribution. Exact
    * integer output, a pure function of (edge set, cap).
    *
    * @param edges (a, h) rows: a = the side to project, h = the hub side
    * @return (a1, a2, w) with a1 < a2 — w = shared hubs of degree ≤ cap */
  def projectBipartite(edges: DataFrame, cap: Int): DataFrame = {
    require(cap >= 2, s"a projecting hub needs degree >= 2, got cap=$cap")
    val e = edges.select(col("a").cast("long").as("a"),
        col("h").cast("long").as("h"))
      .distinct().localCheckpoint(true)
    val kept = e.join(
      e.groupBy("h").agg(count(lit(1)).as("__hd"))
        .filter(col("__hd") <= cap).select(col("h")),
      Seq("h"), "left_semi")
    val out = kept.as("x").join(kept.as("y"),
        col("x.h") === col("y.h") && col("x.a") < col("y.a"))
      .groupBy(col("x.a").as("a1"), col("y.a").as("a2"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(e)
    out
  }

  /** `rounds` peeling rounds toward the k-CORE: each round drops NODES
    * with degree < k and recomputes degrees over the induced subgraph —
    * the node-level cohesion cascade ([[kTruss]] is the edge-level one;
    * cores are cheaper — a degree aggregate per round instead of a
    * triangle pass — and the standard crawl-frontier / spam-farm
    * peel). Fixed rounds keep it a pure function of (edges, k, rounds);
    * callers wanting the fixpoint re-run until the edge count stops
    * moving (monotone decreasing). Per-round edges are
    * localCheckpointed.
    * @return the surviving (u, v) canonical edges after `rounds` */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = e.select(col("u").as("node"))
        .union(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("node"))
      val next = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(e)
      e = next
    }
    e
  }

  /** Bounded-hop BFS distances from a seed set — the remaining member of
    * the Pregel-shaped family ([[pageRankInt]] diffuses mass,
    * [[labelPropagation]] diffuses labels; this diffuses REACH): crawl
    * depth from trusted hosts, blast-radius labeling from flagged docs,
    * "within-k-hops" candidate scoping for the link-prediction operators.
    * Frontier expansion, not distance relaxation: hop h's frontier is the
    * out-neighbors of hop h−1 minus everything already labeled, so each
    * node is visited exactly once, every iteration's joins are
    * frontier-sized (not graph-sized), and the label is provably the
    * minimum hop count (a node reached at h cannot be reachable at < h —
    * it would already be labeled). A drained frontier makes remaining
    * iterations empty no-ops, so a fixed `maxHops` matches the unrolled
    * SQL twin ([[bfsSql]]) without an early-exit action per round.
    *
    * Edges are DIRECTED (src → dst); symmetrize for undirected reach.
    * Nodes unreached within `maxHops` are absent from the output — the
    * caller's outer join reads them as "beyond the horizon".
    * Per-iteration localCheckpoint with superseded generations freed, the
    * family discipline.
    * @return (node, hops) — hops ∈ [0, maxHops], seeds at 0 */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    var dist = seeds.select(col("node").cast("long").as("node")).distinct()
      .withColumn("hops", lit(0L)).localCheckpoint(true)
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("hops") === (h - 1).toLong)
      val next = e
        .join(frontier.select(col("node").as("src")), Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hops", lit(h.toLong))
      val prev = dist
      dist = dist.unionByName(next).localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(prev)
    }
    graft.util.Blocks.freeCheckpoint(e)
    dist
  }

  /** The DuckDB twin of [[bfsHops]], hops unrolled from the same
    * parameters. `edgesCte` must define `e(src, dst)`, `seedsCte` must
    * define `sd(node)`; ends in a SELECT of (node, hops) ordered by
    * node. */
  def bfsSql(edgesCte: String, seedsCte: String, maxHops: Int): String = {
    val its = (1 to maxHops).map { i =>
      s"""f$i AS (SELECT DISTINCT e.dst AS node
         |        FROM e JOIN f${i - 1} ON e.src = f${i - 1}.node
         |        WHERE NOT EXISTS (SELECT 1 FROM d${i - 1} dd
         |                          WHERE dd.node = e.dst)),
         |d$i AS (SELECT node, hops FROM d${i - 1}
         |        UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }
    val ctes = Seq(edgesCte, seedsCte,
      "d0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS hops FROM sd)",
      "f0 AS (SELECT node FROM d0)") ++ its
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT node, hops FROM d$maxHops ORDER BY node""".stripMargin
  }

  /** Link prediction over an undirected edge table: for every NON-adjacent
    * node pair sharing at least one common neighbor, the three classic
    * neighborhood scores — common-neighbor count, the Resource Allocation
    * index (Zhou, Lü & Zhang, EPJ B 2009: Σ_z 1/deg(z) over shared
    * neighbors z — the RA form consistently outperforms Adamic-Adar in
    * their benchmarks AND, unlike AA's 1/log deg, is exactly representable:
    * here as the fixed-point integer Σ `unit div deg(z)`), and the
    * neighborhood-Jaccard denominator |N(u) ∪ N(v)| (the ratio cn/nb_union
    * is left to the caller — two integers are engine-portable, their
    * quotient's last ulp is not). The standard candidate generator for
    * crawl-frontier expansion and near-dup cluster completion ("these two
    * docs share 9 near-dup neighbors but aren't paired — the pair was
    * missed").
    *
    * Skew posture: wedge fan-out through a center z is deg(z)², so one
    * celebrity node makes the naive plan quadratic. Centers with
    * deg > `maxDeg` are EXCLUDED from wedge generation (both score sums
    * then undercount through hubs) — the documented recall dial, same
    * contract as [[projectBipartite]]'s hub cap, and the right semantics
    * for RA anyway: a hub contributes at most unit/maxDeg ≈ nothing per
    * pair while costing deg² candidate rows. With the cap, wedge count is
    * bounded by Σ min(deg, maxDeg)² ≤ maxDeg · m. Degrees feeding
    * `nb_union` are the TRUE degrees (node-local, no fan-out) — only wedge
    * GENERATION is capped, so `nb_union = deg(u) + deg(v) − cn` pairs the
    * capped cn with true degrees and `cn / nb_union` is a LOWER bound on
    * the true neighborhood Jaccard (equality whenever no shared neighbor
    * is a capped hub).
    *
    * Shape at scale: one distinct + degree aggregate, the capped adjacency
    * self-join on the center key, one anti join against the edge set (drops
    * already-adjacent pairs), one map-side-combined (u, v) aggregate, two
    * node-sized degree joins. Exact integer output — a pure function of
    * (edges, maxDeg, unit).
    *
    * @param edges (a, b) rows; direction, parallel edges, self-loops removed
    * @return (u, v, cn, ra_fp, nb_union) — canonical u < v non-adjacent
    *   pairs with ≥ 1 common neighbor through a capped center */
  def linkPredict(edges: DataFrame, maxDeg: Int,
      unit: Long = 1000000000000L): DataFrame = {
    require(maxDeg >= 2, s"maxDeg must be >= 2 (a center needs 2 spokes), got $maxDeg")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    val und = edges.select(
        least(col("a").cast("long"), col("b").cast("long")).as("u"),
        greatest(col("a").cast("long"), col("b").cast("long")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    val adj = und.select(col("u").as("x"), col("v").as("z"))
      .union(und.select(col("v").as("x"), col("u").as("z")))
    val deg = adj.groupBy(col("x").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true)
    val centers = deg.filter(col("d") <= maxDeg)
      .select(col("node").as("z"), col("d").as("__dz"))
    val wedges = adj.join(centers, "z")
      .join(adj.select(col("x").as("y"), col("z")), "z")
      .filter(col("x") < col("y"))
    val open = wedges.join(und,
        col("x") === col("u") && col("y") === col("v"), "left_anti")
      .groupBy(col("x").as("u"), col("y").as("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"$unit div __dz")).as("ra_fp"))
    val out = open
      .join(deg.select(col("node").as("u"), col("d").as("__da")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("__db")), "v")
      .select(col("u"), col("v"), col("cn"), col("ra_fp"),
        (col("__da") + col("__db") - col("cn")).as("nb_union"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(und)
    graft.util.Blocks.freeCheckpoint(deg)
    out
  }

  /** The [[labelPropagation]] SQL twin generator — iterations unrolled as
    * CTEs over an `e(src, dst)` edge CTE, mirroring [[pageRankSql]]. */
  def labelPropSql(edgesCte: String, iters: Int): String = {
    val its = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, l.label, COUNT(*) AS ct
         |        FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |b$i AS (SELECT node, label FROM (
         |          SELECT node, label,
         |                 ROW_NUMBER() OVER (PARTITION BY node
         |                   ORDER BY ct DESC, label) AS rk
         |          FROM c$i) WHERE rk = 1),
         |l$i AS (SELECT p.node, COALESCE(b$i.label, p.label) AS label
         |        FROM l${i - 1} p LEFT JOIN b$i ON p.node = b$i.node)""".stripMargin
    }
    val ctes = Seq(edgesCte,
      "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
      "l0 AS (SELECT node, node AS label FROM n)") ++ its
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT node, label FROM l$iters ORDER BY node""".stripMargin
  }

  /** The DuckDB twin of [[pageRankInt]]: CTE text with the iterations
    * unrolled, generated from the same parameters so the two formulas can
    * never drift. `edgesCte` must define a relation `e(src, dst)`; the
    * returned text continues the WITH chain and ends in a final SELECT of
    * (node, rank_fp) ordered by node.
    *
    * With `seedsCte` (defining `sd(node)`), generates the [[trustRankInt]]
    * twin instead: seed-only start vector and teleport base. */
  def pageRankSql(edgesCte: String, iters: Int, unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100,
      seedsCte: Option[String] = None,
      weighted: Boolean = false): String = {
    val base = unit * (dampDen - dampNum) / dampDen
    val baseExpr = seedsCte match {
      case None => base.toString
      case Some(_) =>
        s"(CASE WHEN n.node IN (SELECT node FROM sd) THEN $base ELSE 0 END)"
    }
    // ONE template for both forms (the pageRankCore discipline, SQL-side):
    // only the contribution numerator and the out-mass aggregate differ
    val contrib = (i: Int) =>
      if (weighted) s"(r${i - 1}.r * e.w) // deg.d" else s"r${i - 1}.r // deg.d"
    val degCte =
      if (weighted) "deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS d FROM e GROUP BY 1)"
      else "deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1)"
    val its = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, CAST(SUM(${contrib(i)}) AS BIGINT) AS m
         |        FROM e JOIN deg ON e.src = deg.src
         |               JOIN r${i - 1} ON r${i - 1}.node = e.src
         |        GROUP BY 1),
         |r$i AS (SELECT n.node,
         |         CAST($baseExpr + ($dampNum * COALESCE(c$i.m, 0)) // $dampDen AS BIGINT) AS r
         |        FROM n LEFT JOIN c$i ON n.node = c$i.node)""".stripMargin
    }
    val r0 = seedsCte match {
      case None => s"r0 AS (SELECT node, CAST($unit AS BIGINT) AS r FROM n)"
      case Some(_) =>
        s"""r0 AS (SELECT node, CAST(CASE WHEN node IN (SELECT node FROM sd)
           |         THEN $unit ELSE 0 END AS BIGINT) AS r FROM n)""".stripMargin
    }
    val ctes = Seq(edgesCte) ++ seedsCte.toSeq ++ Seq(
      "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
      degCte, r0) ++ its
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT node, r AS rank_fp FROM r$iters ORDER BY node""".stripMargin
  }

  /** The [[pageRankIntW]] twin generator — [[pageRankSql]] with the
    * out-weight sum and the per-edge `(r · w) // Σw` contribution;
    * `edgesCte` must define `e(src, dst, w)`. */
  def pageRankWSql(edgesCte: String, iters: Int, unit: Long = 1000000000L,
      dampNum: Long = 85, dampDen: Long = 100): String =
    pageRankSql(edgesCte, iters, unit, dampNum, dampDen, weighted = true)

  /** HITS hubs & authorities (Kleinberg JACM'99) in fixed-point integers —
    * the DIRECTED complement of [[pageRankInt]]: on an asymmetric graph
    * (who-links-to-whom, customer→supplier purchases) it separates the two
    * roles PageRank conflates — a node pointing AT many good sources (hub:
    * a curated link directory, a broad buyer) versus a node many good hubs
    * point TO (authority: the canonical reference, the supplier everyone
    * buys from). Per iteration,
    *
    *   auth_i = Σ_{j→i} hub_j,   then rescaled to max = `unit`;
    *   hub_i  = Σ_{i→j} auth_i', then rescaled to max = `unit`
    *
    * with the rescale an integer `(raw · unit) div max(raw)` — HITS
    * diverges without normalization, and the integer max-rescale replaces
    * the float L2 norm deterministically (same fixed point up to scale;
    * every step a pure integer function of the edge set, so the result
    * hash-oracles via [[hitsSql]], generated from the same parameters).
    *
    * Shape at scale: per iteration two edge⋈score joins + two map-side-
    * combined aggregates (the Pregel shape, once per direction) and two
    * 1-row max aggregates attached as broadcast scalars — never a driver
    * round-trip. Per-iteration localCheckpoint, superseded generations
    * freed ([[pageRankInt]] discipline). Overflow guard: a raw half-step
    * sum is ≤ maxDeg·unit (degree counts parallel-edge MULTIPLICITY, the
    * true bound — a node-count guard would pass a multigraph hub that
    * wraps) and the rescale multiplies by `unit`, so maxDeg·unit² must
    * fit a Long — the default unit 10⁶ allows max degree ~9.2 M; lower
    * `unit` for hotter hubs (precision is 1/unit of the max score).
    *
    * @param edges directed (src, dst) rows; parallel edges count per
    *   occurrence
    * @return (node, hub_fp, auth_fp), both in [0, unit] */
  def hitsInt(edges: DataFrame, iters: Int, unit: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters (HITS scores are " +
      "undefined before the first mutual-reinforcement step)")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(true)
    val n = nodes.count()
    // the binding bound is the busiest node, not the node count: a raw
    // half-step sum is <= maxDeg * unit (scores are rescaled to <= unit,
    // and parallel edges COUNT, so degree here is edge multiplicity), and
    // the rescale multiplies it by unit again. Each half-step sums over
    // ONE direction, so the bound is the larger of the per-direction
    // maxima — summing in+out per node would spuriously reject graphs
    // the algorithm handles
    val maxDeg = if (n == 0) 1L else {
      def dmax(c: String) = e.groupBy(col(c)).agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      math.max(dmax("src"), dmax("dst"))
    }
    require(n == 0 || unit <= Long.MaxValue / unit / maxDeg,
      s"maxDeg=$maxDeg at unit=$unit can overflow Long in the rescale — " +
        "lower unit (the guard is maxDeg * unit * unit <= Long.Max)")
    // one half-step: raw sums of `scores` pulled across `edges` keyed
    // (from, to), then the integer max-rescale onto the node spine
    def halfStep(scores: DataFrame, from: String, to: String): DataFrame = {
      val raw = e.join(scores.withColumnRenamed("node", from), from)
        .groupBy(col(to).as("node")).agg(sum(col("s")).as("__raw"))
      val mx = raw.agg(greatest(max(col("__raw")), lit(1L)).as("__mx"))
      nodes.join(raw, Seq("node"), "left_outer")
        .crossJoin(broadcast(mx)) // 1-row scalar attach
        .select(col("node"),
          expr(s"(coalesce(__raw, 0L) * $unit) div __mx").as("s"))
        .localCheckpoint(true)
    }
    var hub = nodes.withColumn("s", lit(unit)).localCheckpoint(true)
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val prevA = auth
      auth = halfStep(hub, "src", "dst")
      if (prevA != null) graft.util.Blocks.freeCheckpoint(prevA)
      val prevH = hub
      hub = halfStep(auth, "dst", "src")
      graft.util.Blocks.freeCheckpoint(prevH)
    }
    val out = hub.select(col("node"), col("s").as("hub_fp"))
      .join(auth.select(col("node"), col("s").as("auth_fp")), "node")
    graft.util.Blocks.freeCheckpoint(nodes)
    graft.util.Blocks.freeCheckpoint(e)
    out
  }

  /** The DuckDB twin of [[hitsInt]] — iterations unrolled from the same
    * parameters ([[pageRankSql]] stance). `edgesCte` must define
    * `e(src, dst)`; ends in a SELECT of (node, hub_fp, auth_fp) by node. */
  def hitsSql(edgesCte: String, iters: Int, unit: Long = 1000000L): String = {
    val its = (1 to iters).map { i =>
      s"""ra$i AS (SELECT e.dst AS node, CAST(SUM(h${i - 1}.s) AS BIGINT) AS raw
         |         FROM e JOIN h${i - 1} ON e.src = h${i - 1}.node GROUP BY 1),
         |ma$i AS (SELECT GREATEST(MAX(raw), 1) AS mx FROM ra$i),
         |a$i AS (SELECT n.node,
         |          CAST((COALESCE(ra$i.raw, 0) * $unit) // ma$i.mx AS BIGINT) AS s
         |        FROM n LEFT JOIN ra$i ON n.node = ra$i.node CROSS JOIN ma$i),
         |rh$i AS (SELECT e.src AS node, CAST(SUM(a$i.s) AS BIGINT) AS raw
         |         FROM e JOIN a$i ON e.dst = a$i.node GROUP BY 1),
         |mh$i AS (SELECT GREATEST(MAX(raw), 1) AS mx FROM rh$i),
         |h$i AS (SELECT n.node,
         |          CAST((COALESCE(rh$i.raw, 0) * $unit) // mh$i.mx AS BIGINT) AS s
         |        FROM n LEFT JOIN rh$i ON n.node = rh$i.node CROSS JOIN mh$i)""".stripMargin
    }
    val ctes = Seq(edgesCte,
      "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
      s"h0 AS (SELECT node, CAST($unit AS BIGINT) AS s FROM n)") ++ its
    s"""WITH ${ctes.mkString(",\n")}
       |SELECT h$iters.node, h$iters.s AS hub_fp, a$iters.s AS auth_fp
       |FROM h$iters JOIN a$iters ON h$iters.node = a$iters.node
       |ORDER BY h$iters.node""".stripMargin
  }
}

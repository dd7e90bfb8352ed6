package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes

/** Relational completeness beyond the reference's own surface (a user
  * switching engines expects the standard algebra to be there): semi/anti
  * joins, set operations, deterministic order-limit, scalar subquery. */
object RelQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // EXISTS — orders that have at least one R-flagged lineitem.
    "q_join_semi" -> { (s, dir) =>
      val o = Envelopes.table(s, dir, "orders")
      val li = Envelopes.table(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // NOT EXISTS — customers with no orders.
    "q_join_anti" -> { (s, dir) =>
      val c = Envelopes.table(s, dir, "customer")
      val o = Envelopes.table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // UNION/INTERSECT/EXCEPT over supplier vs customer nation keys.
    "q_set_ops" -> { (s, dir) =>
      val cn = Envelopes.table(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sn = Envelopes.table(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      val u = cn.union(sn).distinct().withColumn("op", lit("union"))
      val i = cn.intersect(sn).withColumn("op", lit("intersect"))
      val e = cn.distinct().except(sn).withColumn("op", lit("except"))
      u.union(i).union(e).orderBy(col("op"), col("nk"))
    },

    // deterministic ORDER BY ... LIMIT (top-20 orders, total order).
    "q_order_limit" -> { (s, dir) =>
      Envelopes.table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // pivot — events per user by type via Dataset.pivot with an explicit
    // value list (plans as one aggregation pass; the oracle spells the same
    // result with FILTER-clause counts).
    "q_pivot" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    },

    // exact interpolated median per returnflag (percentile ↔ quantile_cont).
    "q_median" -> { (s, dir) =>
      Envelopes.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"))
        .orderBy(col("l_returnflag"))
    },

    // scalar subquery — orders above 1.5x the exact-decimal average price.
    "q_scalar_subq" -> { (s, dir) =>
      val o = Envelopes.table(s, dir, "orders")
      val avgRow = o.agg((sum(col("o_totalprice").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("avg_price"))
      o.crossJoin(avgRow)
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // CUBE — all four grouping combinations in one aggregation pass.
    "q_cube" -> { (s, dir) =>
      Envelopes.table(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("order_ct"),
          sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Explicit GROUPING SETS — the two single-dimension rollups in one pass
    // (completes the CUBE/ROLLUP grouping family).
    "q_grouping_sets" -> { (s, dir) =>
      Envelopes.table(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("order_ct"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Navigation window functions: lag/lead/first_value/ntile over a total
    // per-customer order (ntile cast to long — DuckDB's is BIGINT).
    "q_lead_lag" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Envelopes.table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          ntile(4).over(w).cast("long").as("q4"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // unpivot / melt — wide measure columns to long form in one pass (the
    // oracle spells the same relation as a UNION ALL).
    "q_unpivot" -> { (s, dir) =>
      Envelopes.table(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    },

    // Distribution window functions: percent_rank/cume_dist (exact int/int
    // double ratios), nth_value on the default running frame, last_value on
    // an explicit full frame.
    "q_window_fns" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Envelopes.table(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_totalprice"), 3).over(w).as("third_price"),
          last_value(col("o_totalprice")).over(wFull).as("top_price"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // Z-order (Morton) layout key over (partkey, suppkey) — the multi-column
    // clustering value behind OPTIMIZE ZORDER; 10-bit interleave, pure
    // shift/mask arithmetic (codegen, engine-portable).
    "q_zorder" -> { (s, dir) =>
      import graft.ops.Scale
      Envelopes.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          Scale.zorderValue(pmod(col("l_partkey"), lit(1024)),
            pmod(col("l_suppkey"), lit(1024)), bits = 10).as("zval"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Dense deterministic ids without a global sort: two-level ranking
    // (local rank inside a monotone id-div-4096 bucket + broadcast bucket
    // offsets from a metadata-sized running sum) — equals the global
    // row_number the oracle computes the expensive way.
    "q_dense_ids" -> { (s, dir) =>
      import graft.ops.Scale
      Scale.denseIds(
          Envelopes.table(s, dir, "documents").select(col("doc_id"), col("lang")),
          expr("doc_id div 4096"), Seq(col("doc_id")))
        .select(col("doc_id"), col("lang"), col("dense_id"))
        .orderBy(col("doc_id"))
    },

    // Z-order with AUTO-PROFILED domain normalization: bounds from the
    // one-pass Scale.dimBounds stats scan, each dimension linearly mapped
    // onto the shared 10-bit range before interleaving — the end-to-end
    // form of the normalizeDim caveat (unequal raw domains let the wider
    // dimension own the curve). The oracle recomputes the bounds in its own
    // stats CTE and replays the identical clamp-scale-interleave formula.
    "q_zorder_auto" -> { (s, dir) =>
      import graft.ops.Scale
      val li = Envelopes.table(s, dir, "lineitem")
        .withColumn("__price", floor(col("l_extendedprice")).cast("long"))
      val ((xlo, xhi), (ylo, yhi)) =
        Scale.dimBounds(li, col("l_partkey"), col("__price"))
      li.select(col("l_orderkey"), col("l_linenumber"),
          Scale.zorderValue(
            Scale.normalizeDimOrZero(col("l_partkey"), xlo, xhi, 10),
            Scale.normalizeDimOrZero(col("__price"), ylo, yhi, 10),
            bits = 10).as("zval"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Integer-exact PageRank (3 iterations) over the symmetrized
    // customer↔supplier trade graph (distinct pairs via orders⋈lineitem;
    // suppliers offset by 10^7 into a shared node space) — the link-graph
    // centrality signal web-corpus curation weighs hosts by, demonstrated
    // on the warehouse's own entity graph. Symmetrizing makes the graph
    // dangling-free, so no rank mass leaks. The oracle unrolls the three
    // iterations from the SAME parameter set via Graph.pageRankSql.
    "q_pagerank" -> { (s, dir) =>
      graft.ops.Graph.pageRankInt(tradeGraphEdges(s, dir), iters = 3)
        .orderBy(col("node"))
    },

    // TrustRank: personalized PageRank with teleport restricted to a seed
    // list (customers with custkey % 101 == 0 stand in for the hand-audited
    // trusted set) over the same symmetrized trade graph — trust propagates
    // outward from the seeds; nodes unreachable from any seed read exactly 0.
    "q_trustrank" -> { (s, dir) =>
      val seeds = Envelopes.table(s, dir, "customer")
        .filter(col("c_custkey") % 101 === 0)
        .select(col("c_custkey").as("node"))
      graft.ops.Graph.trustRankInt(tradeGraphEdges(s, dir), seeds, iters = 3)
        .orderBy(col("node"))
    },

    // Bounded-hop BFS from the trusted seed set over the same graph —
    // crawl depth / blast radius: hop 1 = suppliers of seed customers,
    // hop 2 = customers sharing those suppliers, hop 3 = their other
    // suppliers; nodes beyond 3 hops are absent.
    "q_bfs_hops" -> { (s, dir) =>
      val seeds = Envelopes.table(s, dir, "customer")
        .filter(col("c_custkey") % 101 === 0)
        .select(col("c_custkey").as("node"))
      graft.ops.Graph.bfsHops(tradeGraphEdges(s, dir), seeds, maxHops = 3)
        .orderBy(col("node"))
    },

    // Deterministic synchronous label propagation over the same graph —
    // community detection with the smallest-label tie-break making the
    // labeling a pure function of (edges, iters).
    "q_label_prop" -> { (s, dir) =>
      graft.ops.Graph.labelPropagation(tradeGraphEdges(s, dir), iters = 3)
        .orderBy(col("node"))
    },

    // Link prediction over the trade graph: non-adjacent node pairs
    // sharing >= 1 common neighbor through a deg <= 8 center (the
    // bipartite shape makes every wedge open — two customers sharing a
    // supplier are never themselves linked), scored by common-neighbor
    // count, fixed-point Resource Allocation (1e12 div deg), and the
    // neighborhood-union size — the crawl-frontier / co-purchase
    // candidate generator. The tight cap is the hub dial: TPC-H suppliers
    // serve thousands of customers and would otherwise fan out
    // quadratically while contributing ~nothing per pair.
    "q_link_pred" -> { (s, dir) =>
      val e = tradeGraphEdges(s, dir)
        .select(col("src").as("a"), col("dst").as("b"))
      graft.ops.Graph.linkPredict(e, maxDeg = 8)
        .orderBy(col("u"), col("v"))
    },

    // Hub-capped one-mode projection: suppliers sharing a LOW-DEGREE
    // customer become weighted edges — how the unipartite graph the rank/
    // community operators consume is derived from co-purchase data. The
    // cap (12) drops celebrity customers whose C(d,2) pair fan-out costs
    // everything and signals nothing.
    "q_bipartite_proj" -> { (s, dir) =>
      val o = Envelopes.table(s, dir, "orders")
      val l = Envelopes.table(s, dir, "lineitem")
      val e = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("a"), col("o_custkey").as("h"))
      graft.ops.Graph.projectBipartite(e, cap = 12)
        .orderBy(col("a1"), col("a2"))
    },

    // HITS hubs/authorities (2 iterations) over the DIRECTED half of the
    // trade graph (customer → supplier purchases): hubs = buyers whose
    // purchases concentrate on widely-bought suppliers, authorities = the
    // suppliers those hubs converge on — the two roles the symmetrized
    // PageRank collapses into one score. Integer max-rescale per half-step;
    // oracle unrolled from the same parameters via Graph.hitsSql.
    "q_hits" -> { (s, dir) =>
      val directed = tradeGraphEdges(s, dir).filter(col("src") < 10000000L)
      graft.ops.Graph.hitsInt(directed, iters = 2).orderBy(col("node"))
    },

    // Weighted PageRank over the symmetrized projection: rank flows
    // proportionally to shared-customer counts — the full derive-then-rank
    // chain (bipartite data → capped projection → weighted centrality).
    "q_pagerank_weighted" -> { (s, dir) =>
      val o = Envelopes.table(s, dir, "orders")
      val l = Envelopes.table(s, dir, "lineitem")
      val bip = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("l_suppkey").as("a"), col("o_custkey").as("h"))
      val proj = graft.ops.Graph.projectBipartite(bip, cap = 12)
      val edges = proj.select(col("a1").as("src"), col("a2").as("dst"),
          col("w"))
        .unionByName(proj.select(col("a2").as("src"), col("a1").as("dst"),
          col("w")))
      val pr = graft.ops.Graph.pageRankIntW(edges, iters = 3)
      graft.util.Blocks.freeCheckpoint(proj)
      pr.orderBy(col("node"))
    })

  /** The symmetrized customer↔supplier trade graph both rank queries run
    * on — ONE definition (Spark side here, oracle side [[TradeGraphCte]]),
    * so a change to the graph (e.g. the supplier id offset) cannot silently
    * diverge the two oracled queries. Memoized per (session, dir) as a
    * checkpointed table via the shared [[graft.util.CorpusCache]] (one LRU
    * implementation — cap and eviction contract documented there): the
    * orders⋈lineitem distinct is the dominant cost of the three graph
    * queries and is identical between them. */
  private val edgeCache =
    new graft.util.CorpusCache[DataFrame](graft.util.Blocks.freeCheckpoint)
  private def tradeGraphEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.get(s, dir) {
      val o = Envelopes.table(s, dir, "orders")
      val l = Envelopes.table(s, dir, "lineitem")
      val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + lit(10000000L)).as("sk"))
        .distinct()
      e0.select(col("c").as("src"), col("sk").as("dst"))
        .unionByName(e0.select(col("sk").as("src"), col("c").as("dst")))
        .localCheckpoint(true)
    }

  /** The oracle-side twin of [[tradeGraphEdges]]. */
  private val TradeGraphCte =
    """e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS sk
      |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |e AS (SELECT c AS src, sk AS dst FROM e0
      |      UNION ALL SELECT sk, c FROM e0)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_join_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_set_ops" ->
      """WITH cn AS (SELECT c_nationkey AS nk FROM customer),
        |     sn AS (SELECT s_nationkey AS nk FROM supplier)
        |SELECT nk, op FROM (
        |  SELECT nk, 'union' AS op FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
        |  UNION ALL
        |  SELECT nk, 'intersect' AS op FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |  UNION ALL
        |  SELECT nk, 'except' AS op FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn))
        |ORDER BY op, nk""".stripMargin,

    "q_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_scalar_subq" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |                             / COUNT(*) FROM orders) * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_ct,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS order_ct
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_lead_lag" ->
      """SELECT o_custkey, o_orderkey,
        |       lag(o_totalprice) OVER w AS prev_price,
        |       lead(o_totalprice) OVER w AS next_price,
        |       first_value(o_totalprice) OVER w AS first_price,
        |       ntile(4) OVER w AS q4
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q_window_fns" ->
      """SELECT o_orderstatus, o_orderkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(o_totalprice, 3) OVER w AS third_price,
        |       last_value(o_totalprice) OVER (PARTITION BY o_orderstatus
        |         ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS top_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q_zorder" ->
      s"""SELECT l_orderkey, l_linenumber,
         |       CAST(${graft.ops.Scale.zorderSql("(l_partkey % 1024)", "(l_suppkey % 1024)", bits = 10)}
         |            AS BIGINT) AS zval
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_dense_ids" ->
      """SELECT doc_id, lang,
        |       row_number() OVER (ORDER BY doc_id) - 1 AS dense_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_zorder_auto" -> {
      val price = "CAST(FLOOR(l_extendedprice) AS BIGINT)"
      val nx = graft.ops.Scale.normalizeSqlOrZero("l_partkey", "st.xlo", "st.xhi", 10)
      val ny = graft.ops.Scale.normalizeSqlOrZero(price, "st.ylo", "st.yhi", 10)
      s"""WITH st AS (SELECT MIN(l_partkey) AS xlo, MAX(l_partkey) AS xhi,
         |                   MIN($price) AS ylo, MAX($price) AS yhi
         |            FROM lineitem)
         |SELECT l_orderkey, l_linenumber,
         |       CAST(${graft.ops.Scale.zorderSql(s"($nx)", s"($ny)", bits = 10)}
         |            AS BIGINT) AS zval
         |FROM lineitem, st ORDER BY l_orderkey, l_linenumber""".stripMargin
    },

    "q_pagerank" -> graft.ops.Graph.pageRankSql(TradeGraphCte, iters = 3),

    "q_bfs_hops" -> graft.ops.Graph.bfsSql(TradeGraphCte,
      "sd AS (SELECT c_custkey AS node FROM customer WHERE c_custkey % 101 = 0)",
      maxHops = 3),

    "q_trustrank" -> graft.ops.Graph.pageRankSql(TradeGraphCte, iters = 3,
      seedsCte = Some(
        "sd AS (SELECT c_custkey AS node FROM customer WHERE c_custkey % 101 = 0)")),

    "q_label_prop" -> graft.ops.Graph.labelPropSql(TradeGraphCte, iters = 3),

    // the directed customer→supplier half of the shared trade graph
    "q_hits" -> graft.ops.Graph.hitsSql(
      """e0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey + 10000000 AS sk
        |       FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT c AS src, sk AS dst FROM e0)""".stripMargin,
      iters = 2),

    // Open wedges through deg <= 8 centers, minus adjacent pairs; RA in
    // integer fixed point (1e12 // deg), union size from true degrees —
    // the orientation-free twin of the capped wedge plan.
    "q_link_pred" ->
      s"""WITH $TradeGraphCte,
         |p AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
         |      FROM e WHERE src <> dst),
         |adj AS (SELECT u AS x, v AS z FROM p UNION ALL SELECT v, u FROM p),
         |deg AS (SELECT x AS node, COUNT(*) AS d FROM adj GROUP BY 1),
         |ctr AS (SELECT node AS z, d FROM deg WHERE d <= 8),
         |wed AS (SELECT a.x AS u, b.x AS v, c.d
         |        FROM adj a JOIN ctr c ON a.z = c.z
         |                   JOIN adj b ON b.z = a.z AND a.x < b.x),
         |nw AS (SELECT w.u, w.v, w.d FROM wed w
         |       LEFT JOIN p ON p.u = w.u AND p.v = w.v
         |       WHERE p.u IS NULL),
         |sc AS (SELECT u, v, COUNT(*) AS cn,
         |         CAST(SUM(1000000000000 // d) AS BIGINT) AS ra_fp
         |       FROM nw GROUP BY 1, 2)
         |SELECT s.u, s.v, s.cn, s.ra_fp,
         |       da.d + db.d - s.cn AS nb_union
         |FROM sc s JOIN deg da ON da.node = s.u
         |          JOIN deg db ON db.node = s.v
         |ORDER BY s.u, s.v""".stripMargin,

    "q_bipartite_proj" ->
      """WITH e AS (SELECT DISTINCT l_suppkey AS a, o_custkey AS h
        |           FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |hd AS (SELECT h FROM e GROUP BY h HAVING COUNT(*) <= 12),
        |k AS (SELECT e.a, e.h FROM e JOIN hd ON e.h = hd.h)
        |SELECT x.a AS a1, y.a AS a2, CAST(COUNT(*) AS BIGINT) AS w
        |FROM k x JOIN k y ON x.h = y.h AND x.a < y.a
        |GROUP BY 1, 2 ORDER BY a1, a2""".stripMargin,

    "q_pagerank_weighted" -> graft.ops.Graph.pageRankWSql(
      """bip AS (SELECT DISTINCT l_suppkey AS a, o_custkey AS h
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |hd AS (SELECT h FROM bip GROUP BY h HAVING COUNT(*) <= 12),
        |kk AS (SELECT bip.a, bip.h FROM bip JOIN hd ON bip.h = hd.h),
        |proj AS (SELECT x.a AS a1, y.a AS a2, COUNT(*) AS w
        |         FROM kk x JOIN kk y ON x.h = y.h AND x.a < y.a
        |         GROUP BY 1, 2),
        |e AS (SELECT a1 AS src, a2 AS dst, w FROM proj
        |      UNION ALL SELECT a2, a1, w FROM proj)""".stripMargin,
      iters = 3))
}

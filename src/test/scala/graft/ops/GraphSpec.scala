package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Integer-exact PageRank: hand-computed fixed-point ranks on a tiny graph,
  * teleport-only behavior for no-in-edge nodes, dangling leak semantics,
  * partition independence, and the Long-overflow guard. */
class GraphSpec extends SparkSpec {

  private val U = 1000000000L // unit
  private val B = U * 15 / 100 // teleport base at 85/100 damping

  test("one iteration matches the hand-computed integer update") {
    import spark.implicits._
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 1 : out-degrees 2, 1, 1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRankInt(e, iters = 1, unit = U).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // contributions: node1 spreads U/2 to {2,3}; node2 spreads U to 3;
    // node3 spreads U to 1
    assert(r1(1L) == B + 85L * U / 100)
    assert(r1(2L) == B + 85L * (U / 2) / 100)
    assert(r1(3L) == B + 85L * (U / 2 + U) / 100)
    // second iteration folds the updated ranks the same way
    val r2 = Graph.pageRankInt(e, iters = 2, unit = U).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(1L) == B + 85L * r1(3L) / 100)
    assert(r2(2L) == B + 85L * (r1(1L) / 2) / 100)
    assert(r2(3L) == B + 85L * (r1(1L) / 2 + r1(2L)) / 100)
  }

  test("no-in-edge nodes keep only the teleport base; dangling mass leaks") {
    import spark.implicits._
    // 1 -> 2 : node 1 has no in-edges, node 2 is dangling (no out-edges)
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val r = Graph.pageRankInt(e, iters = 2, unit = U).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == B, "source keeps only the teleport base")
    // node 2 receives node 1's full rank each step but spreads to no one —
    // its mass simply leaves the system (documented simplification)
    assert(r(2L) == B + 85L * B / 100)
  }

  test("ranks are partition-independent and iters=0 is the uniform start") {
    import spark.implicits._
    val e = (1L to 200L).map(i => (i, i % 50 + 1)).toDF("src", "dst")
    val a = Graph.pageRankInt(e, iters = 3, unit = U)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Graph.pageRankInt(e.repartition(7, col("dst")), iters = 3, unit = U)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.nonEmpty)
    val z = Graph.pageRankInt(e, iters = 0, unit = U).select("rank_fp")
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(z == Seq(U))
  }

  test("the overflow guard refuses a unit the node count can wrap") {
    import spark.implicits._
    val e = (1L to 100L).map(i => (i, i % 10 + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankInt(e, iters = 1, unit = Long.MaxValue / 85 / 10)
    }
    assert(ex.getMessage.contains("overflow"), ex.getMessage)
  }

  test("trustRank: mass flows only from seeds; unreachable nodes stay exactly 0") {
    import spark.implicits._
    // 1 -> 2 -> 3 chain, plus isolated pair 4 -> 5; seed = {1}
    val e = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.trustRankInt(e, seeds, iters = 2, unit = U).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // the seed keeps only its teleport base (nothing links to it); node 2
    // receives 85% of the seed's iteration-1 rank (= the base), no base of
    // its own — non-seeds get no teleport mass
    assert(r(1L) == B)
    assert(r(2L) == 85L * B / 100)
    // nodes 4 and 5 are unreachable from the seed: exactly zero trust
    assert(r(4L) == 0L && r(5L) == 0L)
    // node 3 is two hops out: receives at iteration 2 what 2 held after 1
    assert(r(3L) == 85L * (85L * U / 100) / 100)
  }

  test("label propagation finds the two communities and is partition-independent") {
    val s = spark
    import s.implicits._
    // two triangles {1,2,3} and {10,11,12} joined by one bridge 3-10,
    // symmetrized — LPA must converge each triangle to its min label, and
    // the plurality rule must keep the bridge from merging them
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (3L, 10L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each triangle converges to ONE internal label and the two stay
    // distinct (the plurality rule keeps the bridge from merging them);
    // WHICH id represents a community depends on how labels travel over
    // the bridge (here the right triangle ends on the bridge node's
    // original label 3) — deterministic, but not "the min of the triangle"
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(10L, 11L, 12L).map(got)
    assert(left.size == 1, s"left triangle must be uniform: $got")
    assert(right.size == 1, s"right triangle must be uniform: $got")
    assert(left != right, s"communities must stay separate: $got")
    // determinism under repartitioning (the plurality window is total-ordered)
    val again = Graph.labelPropagation(e.repartition(7), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
    // iters = 0 is the identity labeling
    val id0 = Graph.labelPropagation(e, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(id0.forall { case (n, l) => n == l })
  }

  test("triangleCounts: hand-counted graph, input-form independence, skew apex") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 4-5 +
    // triangle {6,7,8}; fed DIRTY: reversed duplicates and a self-loop
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val dirty = (k4 ++ Seq((5L, 4L), (6L, 7L), (8L, 7L), (6L, 8L),
      (7L, 6L), (3L, 3L))).toDF("a", "b")
    val got = Graph.triangleCounts(dirty).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert((1L to 3L).forall(got(_) == ((3L, 3L))))
    assert(got(4L) == ((4L, 3L)) && got(5L) == ((1L, 0L)))
    assert((6L to 8L).forall(got(_) == ((2L, 1L))))

    // skew: a star (hub 0 - leaves 1..200) has NO triangles, and the
    // orientation keeps the hub's out-degree at zero wedge fan-out
    val star = (1L to 200L).map(i => (0L, i)).toDF("a", "b")
    val st = Graph.triangleCounts(star)
    assert(st.agg(sum(col("tri_ct"))).head().getLong(0) == 0L)
    assert(st.count() == 201L)

    // partition independence: same result under a different layout
    val re = Graph.triangleCounts(dirty.repartition(7)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(re == got)
  }

  test("trussSupport: K4 edges carry 2, triangle edges 1, bridges 0") {
    val s = spark
    import s.implicits._
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val dirty = (k4 ++ Seq((5L, 4L), (6L, 7L), (8L, 7L), (6L, 8L),
      (3L, 3L), (2L, 1L))).toDF("a", "b")
    val got = Graph.trussSupport(dirty).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every K4 edge sits in exactly 2 of its 4 triangles
    assert(k4.forall(e => got(e) == 2L), got.toString)
    assert(got((4L, 5L)) == 0L, "pendant edge is a bridge")
    assert(Seq((6L, 7L), (7L, 8L), (6L, 8L)).forall(got(_) == 1L))
    // node/edge consistency: each node's triangle count = half the sum of
    // its incident edges' supports (each triangle at a node covers 2 edges)
    val nodeCts = Graph.triangleCounts(dirty).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val incident = got.toSeq.flatMap { case ((u, v), sp) =>
      Seq(u -> sp, v -> sp) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(nodeCts.forall { case (n, c) => incident(n) == 2 * c })
  }

  test("kTruss: K5 survives, weak structures cascade out round by round") {
    val s = spark
    import s.implicits._
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    // diamond 10-11-12 / 11-12-13: the shared edge (11,12) has support 2
    // and survives round 1 of a 4-truss peel; with its side edges gone it
    // has no triangles left and dies in round 2 — the cascade
    val diamond = Seq((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L),
      (12L, 13L))
    val g = (k5 ++ diamond).toDF("a", "b")
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = edges(Graph.kTruss(g, k = 4, rounds = 1))
    assert(r1 == (k5.toSet + ((11L, 12L))), r1.toString)
    val r2 = edges(Graph.kTruss(g, k = 4, rounds = 2))
    assert(r2 == k5.toSet, r2.toString)
    // K5 is a 5-truss too (every edge in 3 triangles); nothing survives k=6
    assert(edges(Graph.kTruss(g, k = 5, rounds = 2)) == k5.toSet)
    assert(Graph.kTruss(g, k = 6, rounds = 2).isEmpty)
  }

  test("projectBipartite: shared-hub weights; over-cap hubs contribute nothing") {
    val s = spark
    import s.implicits._
    // hub 100 links {1,2,3}; hub 101 links {2,3}; hub 102 links {1..5}
    val e = (Seq(1L, 2L, 3L).map(a => (a, 100L)) ++
      Seq(2L, 3L).map(a => (a, 101L)) ++
      (1L to 5L).map(a => (a, 102L)) ++
      Seq((1L, 100L))).toDF("a", "h") // duplicate edge: must not double
    val got = Graph.projectBipartite(e, cap = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // hub 102 (degree 5 > 4) is dropped entirely
    assert(got == Map((1L, 2L) -> 1L, (1L, 3L) -> 1L, (2L, 3L) -> 2L), got)
    // with the cap raised, 102's C(5,2) pairs appear
    val all = Graph.projectBipartite(e, cap = 5)
    assert(all.count() == 10L)
    assert(all.filter(col("a1") === 2 && col("a2") === 3).head().getLong(2) == 3L)
  }

  test("pageRankIntW: weight-proportional spread; w=1 equals the unweighted form") {
    val s = spark
    import s.implicits._
    // 1 -> 2 (w=3), 1 -> 3 (w=1): node 1 spreads 3/4 to 2, 1/4 to 3
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r1 = Graph.pageRankIntW(e, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after 1 iter: r2 = B + 85*(U*3 div 4) div 100, r3 = B + 85*(U div 4) div 100
    assert(r1(2L) == B + 85L * (U * 3 / 4) / 100)
    assert(r1(3L) == B + 85L * (U / 4) / 100)
    assert(r1(1L) == B + 85L * (U + U) / 100) // both in-edges at full weight

    // w = 1 on every edge reproduces the unweighted operator bit-for-bit
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)).toDF("src", "dst")
    val un = Graph.pageRankInt(g, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w1 = Graph.pageRankIntW(g.withColumn("w", lit(1L)), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(un == w1)

    // weights must be positive
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankIntW(Seq((1L, 2L, 0L)).toDF("src", "dst", "w"), 1)
    }
    assert(ex.getMessage.contains("weights"))
  }

  test("kCore: the star collapses round by round, the clique survives") {
    val s = spark
    import s.implicits._
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    // star: hub 10 with leaves 11..15 — leaves (deg 1) drop in round 1,
    // the hub (deg 0 after) drops in round 2: the cascade
    val star = (11L to 15L).map(l => (10L, l))
    val g = (k4 ++ star).toDF("a", "b")
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges(Graph.kCore(g, k = 3, rounds = 1)) == k4.toSet)
    assert(edges(Graph.kCore(g, k = 3, rounds = 2)) == k4.toSet)
    // K4 is exactly a 3-core; k = 4 empties it
    assert(Graph.kCore(g, k = 4, rounds = 2).isEmpty)
    // chain cascade: path 20-21-22-23 at k=2 loses its endpoints round 1,
    // then the remaining edge's endpoints have degree 1 — empty by round 3
    val path = Seq((20L, 21L), (21L, 22L), (22L, 23L)).toDF("a", "b")
    assert(edges(Graph.kCore(path, k = 2, rounds = 1)) == Set((21L, 22L)))
    assert(Graph.kCore(path, k = 2, rounds = 2).isEmpty)
  }

  test("linkPredict: C4 diagonals, adjacent pairs excluded, hub cap silences centers") {
    val s = spark
    import s.implicits._
    val FP = 1000000000000L
    def scores(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), (Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // 4-cycle: the two diagonals are the only open pairs — cn = 2 through
    // deg-2 centers, ra = 2 · (FP div 2), union = 2 + 2 − 2
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    assert(scores(Graph.linkPredict(c4, maxDeg = 32)) ==
      Map((1L, 3L) -> ((2L, FP, 2L)), (2L, 4L) -> ((2L, FP, 2L))))
    // triangle: every common-neighbor pair is already an edge — empty
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.linkPredict(tri, maxDeg = 32).isEmpty)
    // star: at cap 2 the deg-3 hub is no center — no candidates at all;
    // at cap 3 each leaf pair scores FP div 3 through it
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L)).toDF("a", "b")
    assert(Graph.linkPredict(star, maxDeg = 2).isEmpty)
    assert(scores(Graph.linkPredict(star, maxDeg = 3)) ==
      Map((11L, 12L) -> ((1L, FP / 3, 1L)),
        (11L, 13L) -> ((1L, FP / 3, 1L)),
        (12L, 13L) -> ((1L, FP / 3, 1L))))
  }

  test("labelPropSql twin unrolls exactly the requested iterations") {
    val sql = Graph.labelPropSql("e AS (SELECT 1 AS src, 2 AS dst)", iters = 3)
    assert(sql.contains("l3") && sql.contains("b3") && sql.contains("l0"))
    assert(!sql.contains("l4"))
  }

  test("pageRankSql twin agrees with the operator on the sf0.001 trade graph") {
    // the real agreement check is the DuckDB oracle (q_pagerank); here we
    // pin that the generated SQL references every unrolled CTE it builds
    val sql = Graph.pageRankSql("e AS (SELECT 1 AS src, 2 AS dst)", iters = 3)
    assert(sql.contains("r3") && sql.contains("c3") && sql.contains("r0"))
    assert(!sql.contains("r4"))
    assert(sql.contains("// 100"), "integer floor division in the twin")
  }

  test("bfsHops: min hop counts, cycle safety, horizon cutoff, multi-seed") {
    val s = spark
    import s.implicits._
    // 1→2→3→4→1 cycle plus a shortcut 1→3 and an unreachable 9→10;
    // second seed 4 gives 1 a 1-hop path round the cycle
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (9L, 10L)).toDF("src", "dst")
    val got = Graph.bfsHops(e, Seq(1L).toDF("node"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 via the shortcut at hop 1, NOT hop 2 via 2; 4 at hop 2; 9/10 absent
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val two = Graph.bfsHops(e, Seq(1L, 9L).toDF("node"), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L, 10L -> 1L))
    // horizon 0 = seeds only; drained frontier: extra hops change nothing
    assert(Graph.bfsHops(e, Seq(1L).toDF("node"), 0).count() == 1L)
    val full = Graph.bfsHops(e, Seq(1L).toDF("node"), maxHops = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("hitsInt: hand-computed hubs/authorities on a directed bipartite fixture") {
    val s = spark
    import s.implicits._
    // 1→3, 2→3, 2→4 at unit 100, one iteration:
    // rawA: 3 ← h1+h2 = 200, 4 ← h2 = 100; max 200 → a3 = 100, a4 = 50
    // rawH: 1 ← a3 = 100, 2 ← a3+a4 = 150; max 150 → h1 = 66, h2 = 100
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    def snap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = snap(Graph.hitsInt(e, iters = 1, unit = 100L))
    assert(got == Map(1L -> ((66L, 0L)), 2L -> ((100L, 0L)),
      3L -> ((0L, 100L)), 4L -> ((0L, 50L))), got)
    // partition independence (the scalar max is a global aggregate)
    val re = snap(Graph.hitsInt(e.repartition(7), iters = 1, unit = 100L))
    assert(re == got)
    // a second iteration separates the hubs further: 2 touches both
    // authorities, 1 only the bigger one — hub(2) stays maximal
    val it2 = snap(Graph.hitsInt(e, iters = 2, unit = 100L))
    assert(it2(2L)._1 == 100L && it2(1L)._1 < 100L)
    // the guard refuses a unit the node count can wrap
    val big = (1L to 100L).map(i => (i, i % 10 + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.hitsInt(big, iters = 1, unit = Long.MaxValue / 100)
    }
    assert(ex.getMessage.contains("overflow"))
  }

  test("hitsSql twin unrolls both half-steps per iteration") {
    val sql = Graph.hitsSql("e AS (SELECT 1 AS src, 2 AS dst)", iters = 2)
    assert(sql.contains("a2") && sql.contains("h2") && sql.contains("ma2")
      && sql.contains("mh2") && sql.contains("h0"))
    assert(!sql.contains("a3 AS"))
    assert(sql.contains("//"), "integer floor division in the twin")
  }

  test("bfsSql twin unrolls every hop CTE it builds") {
    val sql = Graph.bfsSql("e AS (SELECT 1 AS src, 2 AS dst)",
      "sd AS (SELECT 1 AS node)", maxHops = 3)
    assert(sql.contains("d3") && sql.contains("f3") && sql.contains("d0"))
    assert(!sql.contains("f4"))
  }
}

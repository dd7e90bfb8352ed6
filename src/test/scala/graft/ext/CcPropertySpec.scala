package graft.ext

import graft.SparkSpec

/** Property check for the pointer-jumping connected components: random
  * graphs against an in-memory union-find oracle, plus a deep chain that
  * specifically exercises the O(log diameter) shortcutting (plain min-label
  * propagation would need one round per hop). */
class CcPropertySpec extends SparkSpec {

  private def unionFindKeepers(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val byRoot = ids.groupBy(find)
    byRoot.values.flatMap(c => { val m = c.min; c.map(_ -> m) }).toMap
  }

  test("random graphs match a union-find oracle on BOTH sides of the driver-local gate") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val want = unionFindKeepers(edges)
      // default gate: the driver-local union-find path (round 15)
      val local = Dedup.connectedComponents(edges.toDF("a_id", "b_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == want, s"trial $trial (driver-local)")
      // gate forced shut: the distributed pointer-jumping loop — the two
      // paths must be indistinguishable (min-label components are unique)
      val dist = Dedup.connectedComponents(edges.toDF("a_id", "b_id"),
          driverLocalMaxEdges = 0L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == want, s"trial $trial (distributed)")
    }
  }

  test("a 30-hop chain converges within the pointer-jumping round budget") {
    val s = spark
    import s.implicits._
    val chain = (1L to 31L).sliding(2).map(w => (w.head, w.last)).toSeq
    // log2(30) ≈ 5; pointer jumping must land well under 10 rounds where
    // plain propagation would need ~30 — gate forced shut so the
    // DISTRIBUTED loop is what converges here
    val got = Dedup.connectedComponents(chain.toDF("a_id", "b_id"),
        maxIter = 10, driverLocalMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(1L) && got.size == 31)
  }
}

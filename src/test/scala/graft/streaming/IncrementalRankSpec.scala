package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Graph

/** Warm-start incremental PageRank over persistent edge + rank stores:
  * first fold IS the cold batch run; after a small edge delta the warm
  * start converges to the final graph's fixed point (within the
  * contraction bound) in fewer iterations than a cold start; an empty
  * delta re-converges in one checking iteration; state survives restart. */
class IncrementalRankSpec extends SparkSpec {

  private val Tol = 10000000L // 1e-2 of unit — keeps iteration counts testable
  private val MaxIters = 60

  // ring + chords: irregular enough for distinct ranks, small enough to
  // iterate fast
  private def baseEdges: Seq[(Long, Long)] = {
    val ring = (0L until 50L).map(i => i -> ((i + 1) % 50))
    val rnd = new scala.util.Random(5)
    val chords = (1 to 30).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    (ring ++ chords).distinct
  }

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cold parity, warm-start savings, empty-delta stability, restart") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_rank").toString + "/pr"

    // first fold == the cold batch run on the same graph, bit for bit
    val b0 = baseEdges.toDF("src", "dst")
    val (r0, it0) = IncrementalRank.updateAndRank(b0, root, Tol, MaxIters)
    val (cold0, itCold0) = Graph.pageRankIntConverge(b0, None, Tol, MaxIters)
    assert(it0 == itCold0, s"first fold must be the cold run: $it0 vs $itCold0")
    assert(ranksOf(r0) == ranksOf(cold0))
    assert(it0 > 1 && it0 < MaxIters, s"fixture must converge mid-range, got $it0")

    // small delta: warm start beats cold on the FINAL graph
    val delta = Seq((1L, 25L), (10L, 40L), (49L, 7L))
    val (r1, itWarm) = IncrementalRank.updateAndRank(
      delta.toDF("src", "dst"), root, Tol, MaxIters)
    val full = (baseEdges ++ delta).distinct.toDF("src", "dst")
    val (cold1, itCold1) = Graph.pageRankIntConverge(full, None, Tol, MaxIters)
    assert(itWarm < itCold1,
      s"warm start must save iterations: warm $itWarm vs cold $itCold1")
    // convergence-to-batch: both vectors are within the contraction bound
    // tol * c/(1-c) of the true fixed point, so within ~2x that of each
    // other (c = 0.85 -> 5.67 tol each; 12 tol covers integer wobble)
    val w = ranksOf(r1); val c = ranksOf(cold1)
    assert(w.keySet == c.keySet)
    val maxDiff = w.keySet.map(k => math.abs(w(k) - c(k))).max
    assert(maxDiff <= 12 * Tol, s"warm and cold fixed points diverged: $maxDiff")

    // empty delta: the stored vector IS the fixed point — one checking
    // iteration, values move at most tol
    val (r2, it2) = IncrementalRank.updateAndRank(
      Seq.empty[(Long, Long)].toDF("src", "dst"), root, Tol, MaxIters)
    assert(it2 == 1, s"re-fold of a converged store must stop at 1, got $it2")
    val v2 = ranksOf(r2)
    assert(w.keySet.map(k => math.abs(w(k) - v2(k))).max <= Tol)

    // restart: a fresh caller reads the persisted vector
    assert(ranksOf(IncrementalRank.readRanks(s, root)) == v2)
  }

  test("edge deletion: re-rank over the surviving set, departed node tombstoned") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_rank_del").toString + "/pr"
    // the ring + a pendant node 99 hanging off node 0 by its only edge
    val edges = baseEdges ++ Seq((0L, 99L), (99L, 3L))
    IncrementalRank.updateAndRank(edges.toDF("src", "dst"), root, Tol, MaxIters)
    // delete node 99's BOTH edges and one chord: the warm re-rank must
    // match the cold batch run over the surviving edges, and 99 must
    // leave the stored vector entirely
    val dels = Seq((0L, 99L), (99L, 3L), (1L, 2L))
    val (r1, _) = IncrementalRank.updateAndRank(
      Seq.empty[(Long, Long)].toDF("src", "dst"), root, Tol, MaxIters,
      edgeDeletes = Some(dels.toDF("src", "dst")))
    val surviving = edges.filterNot(dels.contains)
    val (cold, _) = Graph.pageRankIntConverge(
      surviving.toDF("src", "dst"), None, Tol, MaxIters)
    val w = ranksOf(r1); val c = ranksOf(cold)
    assert(w.keySet == c.keySet, s"node sets diverged: ${w.keySet.diff(c.keySet)} / ${c.keySet.diff(w.keySet)}")
    assert(!w.contains(99L))
    assert(w.keySet.map(k => math.abs(w(k) - c(k))).max <= 12 * Tol)
    // the persisted vector agrees (departed row is a tombstone, not junk)
    assert(ranksOf(IncrementalRank.readRanks(s, root)) == w)
    // RE-ADD a deleted edge: the put supersedes the tombstone
    val (r2, _) = IncrementalRank.updateAndRank(
      Seq((0L, 99L), (99L, 3L)).toDF("src", "dst"), root, Tol, MaxIters)
    val w2 = ranksOf(r2)
    assert(w2.contains(99L))
    val (cold2, _) = Graph.pageRankIntConverge(
      (surviving ++ Seq((0L, 99L), (99L, 3L))).toDF("src", "dst"),
      None, Tol, MaxIters)
    val c2 = ranksOf(cold2)
    assert(w2.keySet == c2.keySet)
    assert(w2.keySet.map(k => math.abs(w2(k) - c2(k))).max <= 12 * Tol)
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming triangle maintenance: the fold over edge batches equals the
  * batch operator over every edge folded so far at EVERY horizon —
  * including batches that close triangles across 1, 2, and 3 new edges —
  * with replay safety and duplicate/reversed-edge tolerance. */
class IncrementalTrianglesSpec extends SparkSpec {

  private def cts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchCts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    cts(graft.ops.Graph.triangleCounts(edges.toDF("a", "b"))
      .filter(col("tri_ct") > 0).select(col("node"), col("tri_ct")))
  }

  test("fold equals batch triangle counts at every horizon") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri").toString
    // batch 0: a triangle {1,2,3} and an open wedge 10-11-12
    // batch 1: close the wedge (1 new edge), add K4 {20..23} (all 6 new —
    //          4 triangles entirely within the batch)
    // batch 2: duplicate + reversed edges (no-ops) and one edge 3-10
    //          (no new triangle), plus 2-4 and 3-4 closing on stored 2-3
    val batches = Seq(
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (11L, 12L)),
      Seq((10L, 12L)) ++ (for (a <- 20L to 23L; b <- 20L to 23L if a < b)
        yield (a, b)),
      Seq((2L, 1L), (12L, 10L), (3L, 10L), (2L, 4L), (4L, 3L)))
    var hist = Seq.empty[(Long, Long)]
    for ((b, i) <- batches.zipWithIndex) {
      hist ++= b
      val got = cts(IncrementalTriangles.mergeEdges(b.toDF("a", "b"), root,
        i.toLong))
      assert(got == batchCts(hist), s"horizon $i diverged: $got")
    }
    // final sanity: K4 members have 3 each, wedge nodes 1 each
    val fin = cts(IncrementalTriangles.readCounts(s, root))
    assert((20L to 23L).forall(fin(_) == 3L))
    assert(Seq(10L, 11L, 12L).forall(fin(_) == 1L))
    assert(fin(4L) == 1L && fin(2L) == 2L)

    // replay batch 2 with DIFFERENT edges: ignored
    val replay = cts(IncrementalTriangles.mergeEdges(
      Seq((50L, 51L)).toDF("a", "b"), root, 2L))
    assert(replay == fin)
  }

  test("edge deletion un-counts exactly the destroyed triangles") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri_del").toString
    // K4 {1..4} (4 triangles) + separate triangle {10,11,12}
    val base = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L))
    IncrementalTriangles.mergeEdges(base.toDF("a", "b"), root, 0L).count()
    // delete TWO edges of the same K4 triangle (1-2, 1-3 both hit
    // triangle {1,2,3} — the largest-removed-edge assignment must debit
    // it once, not twice) + one edge of the separate triangle (reversed
    // + a never-existed edge: both ignored)
    val got = cts(IncrementalTriangles.deleteEdges(
      Seq((1L, 2L), (3L, 1L), (11L, 10L), (77L, 78L)).toDF("a", "b"),
      root, 1L))
    val surviving = base.filterNot(e =>
      Set((1L, 2L), (1L, 3L), (10L, 11L)).contains(e))
    assert(got == batchCts(surviving), s"$got vs ${batchCts(surviving)}")
    // node 1 kept only edge 1-4: zero triangles -> tombstoned, absent
    assert(!got.contains(1L) && got(2L) == 1L && got(3L) == 1L)
    // the separate triangle is gone entirely
    assert(!got.contains(10L) && !got.contains(11L) && !got.contains(12L))
    // replay of the delete fold: ignored
    assert(cts(IncrementalTriangles.deleteEdges(
      Seq((2L, 3L)).toDF("a", "b"), root, 1L)) == got)
    // RE-ADD a deleted edge: the put supersedes the tombstone and the
    // re-closed triangles count again
    val back = cts(IncrementalTriangles.mergeEdges(
      Seq((1L, 2L)).toDF("a", "b"), root, 2L))
    assert(back == batchCts(surviving :+ (1L, 2L)))
    assert(back(1L) == 1L && back(2L) == 2L) // 1-2-4 re-closed
  }

  test("crash between the tombstone merge and the count merge replays exactly") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri_delcw").toString
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
    IncrementalTriangles.mergeEdges(base.toDF("a", "b"), root, 0L).count()
    // simulate the crash window: tombstones committed at ver = 1 (both
    // orientations — the real merge is atomic) but the count merge (and
    // its HWM) lost — written straight to the edge store
    KeyedStore.merge(
      Seq((1L, 3L), (3L, 1L)).toDF("u", "v")
        .withColumn("ver", lit(1L)).withColumn("op_type", lit("delete")),
      s"$root/edges", keys = Seq("u", "v"), seqCols = Seq("ver"),
      numBuckets = 4)
    // the replayed delete fold must reconstruct the pre-deletion
    // adjacency from its own tombstones and debit both triangles of 1-3
    val got = cts(IncrementalTriangles.deleteEdges(
      Seq((1L, 3L)).toDF("a", "b"), root, 1L))
    assert(got == batchCts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))))
    assert(got.isEmpty, s"no triangle survives 1-3's removal: $got")
  }

  test("crash between the edge merge and the count merge loses nothing") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri_cw").toString
    val b0 = Seq((1L, 2L), (2L, 3L))
    val b1 = Seq((1L, 3L), (3L, 4L)) // closes triangle {1,2,3}
    IncrementalTriangles.mergeEdges(b0.toDF("a", "b"), root, 0L)
    // simulate the crash window: batch 1's adjacency rows (both
    // orientations) are persisted at ver=1 but the count store's
    // high-water mark never advanced
    KeyedStore.merge(
      b1.flatMap { case (a, b) => Seq((a, b, 1L, "put"), (b, a, 1L, "put")) }
        .toDF("u", "v", "ver", "op_type"),
      s"$root/edges", keys = Seq("u", "v"), seqCols = Seq("ver"))
    // the replayed fold must still credit the closed triangle
    val got = cts(IncrementalTriangles.mergeEdges(b1.toDF("a", "b"), root, 1L))
    assert(got == batchCts(b0 ++ b1), got.toString)
  }

  test("random graph: fold tracks the batch operator across 4 batches") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri_r").toString
    val rnd = new scala.util.Random(5)
    val batches = (0 until 4).map { _ =>
      (0 until 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
    }
    var hist = Seq.empty[(Long, Long)]
    for ((b, i) <- batches.zipWithIndex) {
      hist ++= b
      val got = cts(IncrementalTriangles.mergeEdges(b.toDF("a", "b"), root,
        i.toLong))
      assert(got == batchCts(hist), s"horizon $i diverged")
    }
  }
}

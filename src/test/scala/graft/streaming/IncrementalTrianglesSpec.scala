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

  test("crash between the edge merge and the count merge loses nothing") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("inc_tri_cw").toString
    val b0 = Seq((1L, 2L), (2L, 3L))
    val b1 = Seq((1L, 3L), (3L, 4L)) // closes triangle {1,2,3}
    IncrementalTriangles.mergeEdges(b0.toDF("a", "b"), root, 0L)
    // simulate the crash window: batch 1's edges are persisted at ver=1
    // but the count store's high-water mark never advanced
    KeyedStore.merge(
      b1.map { case (a, b) => (a, b, 1L) }.toDF("u", "v", "ver"),
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

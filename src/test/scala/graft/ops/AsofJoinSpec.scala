package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** As-of join semantics (latest prior right row, inclusive bound, null pad)
  * and the single-shuffle plan contract of the union-sort formulation. */
class AsofJoinSpec extends SparkSpec {

  test("picks the latest prior right row; inclusive at equal ts; null-pads") {
    val s = spark
    import s.implicits._
    val left = Seq(("k1", 10L, "p1"), ("k1", 5L, "p2"), ("k2", 10L, "p3"))
      .toDF("k", "ts", "l_payload")
    val right = Seq(("k1", 5L, "a"), ("k1", 8L, "b"), ("k3", 1L, "z"))
      .toDF("k", "ts", "r_payload")
    val got = Joins.asof(left, right, key = "k", ts = "ts",
        rightPayload = Seq("r_payload"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got == Set(
      ("k1", 10L, "b"), // latest of {5→a, 8→b} at ts 10
      ("k1", 5L, "a"),  // inclusive: the right row AT ts 5 is visible
      ("k2", 10L, null) // no right history for k2
    ))
  }

  test("range-bin join: inclusive at both bounds, one row per match, cross-bin ranges work") {
    val s = spark
    import s.implicits._
    val vals = Seq((1L, 5.0), (2L, 10.0), (3L, 19.0), (4L, 19.5), (5L, 25.0))
      .toDF("id", "value")
    // range [10, 19] spans bins 1..1 at width 10; [8, 22] spans bins 0..2
    val ranges = Seq(("r1", 10.0, 19.0), ("r2", 8.0, 22.0)).toDF("name", "lo", "hi")
    val got = Joins.rangeBin(vals, ranges, col("value"), col("lo"), col("hi"), 10.0)
      .select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // exactly one output row per (value, containing range): no bin-overlap dups
    assert(got.length == got.distinct.length)
    val set = got.toSet
    assert(set == Set(
      (2L, "r1"), (3L, "r1"),             // 10 and 19: inclusive bounds
      (2L, "r2"), (3L, "r2"), (4L, "r2")  // 8..22 crosses three bins
      // 5.0 below both ranges; 25.0 above both
    ), s"got $set")
  }

  test("resampleFfill grid uses floor semantics for negative (pre-1970) timestamps") {
    val s = spark
    import s.implicits._
    // key n spans -7500..-500 ms: at step 1000 the grid must be the
    // step-multiples inside the span, -7000..-1000 — a truncate-toward-zero
    // `div` idiom would misplace both bounds by one step
    val ev = Seq(("n", -7500L, 1.0, 1L), ("n", -500L, 2.0, 2L),
        ("p", 1500L, 3.0, 3L), ("p", 3200L, 4.0, 4L))
      .toDF("k", "tms", "value", "event_id")
    val got = Windows.resampleFfill(ev, "k", "tms", Seq("value"),
        stepMs = 1000L, ordCol = col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(t => (t._2, t._3)).sorted.toSeq }
    assert(got("n") == (-7L to -1L).map(i => (i * 1000L, 1.0)),
      s"negative-span grid wrong: ${got("n")}")
    assert(got("p") == Seq((2000L, 3.0), (3000L, 3.0)))
  }

  test("union-sort formulation shuffles exactly once (no pair explosion)") {
    val s = spark
    import s.implicits._
    val left = (1 to 100).map(i => ("k" + i % 3, i.toLong, s"p$i")).toDF("k", "ts", "lp")
    val right = (1 to 100).map(i => ("k" + i % 3, i.toLong, s"r$i")).toDF("k", "ts", "rp")
    val plan = Joins.asof(left, right, "k", "ts", Seq("rp"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, plan.take(600))
    assert(!plan.contains("Join"), "as-of must not materialize a join")
  }
}

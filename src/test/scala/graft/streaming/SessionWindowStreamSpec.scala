package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** §2.9's last untested streaming corner: `session_window` aggregation under
  * Structured Streaming. Sessions must merge events within the gap, split on
  * a ≥gap silence, emit ONLY once the watermark passes a session's close
  * (append mode), and the emitted rows must equal the batch `session_window`
  * aggregation over the same events. */
class SessionWindowStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val base = 1700000000000L
  private val Min = 60 * 1000L

  test("streaming session windows close on watermark and match batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // u1: events at 0, 10min, 20min → ONE session (every gap < 30 min),
    //     then 60min → a SECOND session (40 min silence ≥ gap)
    // u2: single event → one single-event session
    val events = Seq(
      (1L, ts(base)), (1L, ts(base + 10 * Min)), (1L, ts(base + 20 * Min)),
      (1L, ts(base + 60 * Min)),
      (2L, ts(base + 5 * Min)))
    // far-future event: advances the watermark past every u1/u2 session close;
    // its own session stays open and must NOT be emitted
    val flusher = (99L, ts(base + 24 * 60 * Min))

    val in = MemoryStream[(Long, Timestamp)]
    val agg = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 second")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("ev_ct"))
      .select(col("user_id"), col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("ev_ct"))

    val q = agg.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(flusher)
      // emission happens in the batch AFTER the watermark advances; poll with
      // a deadline instead of assuming processAllAvailable lands it
      val got = drainSink(q, "sw_out", 3).map(r => (r.getLong(0),
        r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))

      // batch twin over the same events (flusher excluded — its session is
      // still open in the stream, so append mode must not have emitted it)
      val batch = events.toDF("user_id", "ts")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("ev_ct"))
        .select(col("user_id"), col("session_window.start").as("ss"),
          col("session_window.end").as("se"), col("ev_ct"))
        .collect().map(r => (r.getLong(0),
          r.getTimestamp(1).getTime, r.getTimestamp(2).getTime, r.getLong(3)))

      assert(got.toSet == batch.toSet,
        s"stream ${got.toSet} != batch ${batch.toSet}")
      // and the semantics themselves: u1 merged 3 events into one session
      // ending 20min+30min, then a separate single-event session
      assert(got.toSet.contains((1L, base, base + 50 * Min, 3L)))
      assert(got.toSet.contains((1L, base + 60 * Min, base + 90 * Min, 1L)))
      assert(!got.exists(_._1 == 99L), "open session must not be emitted")
    } finally q.stop()
  }
}

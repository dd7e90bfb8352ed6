package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Journey paths under Structured Streaming: `Windows.sessionPaths` takes the
  * watermarked timestamp column as-is, so the SAME operator code must emit
  * closed sessions (append mode) equal to the batch form — including the
  * in-session event ordering inside the path string. */
class SessionPathsStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val base = 1700000000000L
  private val Min = 60 * 1000L

  test("streaming session paths equal batch once the watermark closes them") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // u1 session 1: view → click → purchase (10-min steps);
    // u1 session 2 after a 40-min silence: error;
    // u2: one session; the two equal-timestamp events order by event_id
    val events = Seq(
      (1L, ts(base), "view", 1L), (1L, ts(base + 10 * Min), "click", 2L),
      (1L, ts(base + 20 * Min), "purchase", 3L),
      (1L, ts(base + 60 * Min), "error", 4L),
      (2L, ts(base + 5 * Min), "b", 6L), (2L, ts(base + 5 * Min), "a", 5L))
    val flusher = (99L, ts(base + 24 * 60 * Min), "view", 9L)

    def paths(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Windows.sessionPaths(df, col("user_id"), col("ts"),
        col("event_type"), col("event_id"))

    val in = MemoryStream[(Long, Timestamp, String, Long)]
    val q = paths(in.toDF().toDF("user_id", "ts", "event_type", "event_id")
        .withWatermark("ts", "1 second"))
      .writeStream.format("memory").queryName("paths_out")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(flusher)
      val got = drainSink(q, "paths_out", 3)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      val batch = paths(events.toDF("user_id", "ts", "event_type", "event_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(batch.exists(_._4 == "view>click>purchase"))
      assert(batch.exists(_._4 == "a>b")) // equal-ts tie ordered by event_id
    } finally q.stop()
  }
}

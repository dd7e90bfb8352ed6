package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Windows

/** Streaming parity for the two remaining §2.9 window families: hopping
  * (sliding) windows and the tokenize→explode keyword rollup, both under
  * MemoryStream with watermark-driven append emission, compared against the
  * batch computation over the same rows. */
class HoppingKeywordStreamSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val base = 1700000000000L
  private val Min = 60 * 1000L

  test("hopping windows emit each event into both overlapping windows, equal to batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val events = Seq(("view", ts(base + 10 * Min)), ("view", ts(base + 40 * Min)),
      ("cart", ts(base + 40 * Min)), ("view", ts(base + 70 * Min)))
    val in = MemoryStream[(String, Timestamp)]
    val agg = in.toDF().toDF("et", "ts")
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("et"))
      .agg(count(lit(1)).as("pv"))
      .select(col("window.start").as("ws"), col("et"), col("pv"))
    val q = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(("flush", ts(base + 24 * 60 * Min)))
      val batch = events.toDF("et", "ts")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("et"))
        .agg(count(lit(1)).as("pv"))
        .select(col("window.start").as("ws"), col("et"), col("pv"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      val got = drainSink(q, "hop_out", batch.size)
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      // each event must appear in exactly two hops: total pv = 2 × events
      assert(batch.toSeq.map(_._3).sum == 2L * events.size)
    } finally q.stop()
  }

  test("windowed keyword counts (tokenize → explode) under streaming equal batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = Seq(("big data spark", ts(base + Min)),
      ("spark 大数据", ts(base + 2 * Min)),
      ("data lake", ts(base + 70 * Min)))
    val in = MemoryStream[(String, Timestamp)]
    val agg = in.toDF().toDF("text", "ts")
      .withWatermark("ts", "1 second")
      .select(col("ts"), explode(Windows.tokenize(col("text"))).as("keyword"))
      .groupBy(window(col("ts"), "1 hour"), col("keyword"))
      .agg(count(lit(1)).as("kw_ct"))
      .select(col("window.start").as("ws"), col("keyword"), col("kw_ct"))
    val q = agg.writeStream.format("memory").queryName("kw_out")
      .outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData(("flush", ts(base + 24 * 60 * Min)))
      val batch = rows.toDF("text", "ts")
        .select(col("ts"), explode(Windows.tokenize(col("text"))).as("keyword"))
        .groupBy(window(col("ts"), "1 hour"), col("keyword"))
        .agg(count(lit(1)).as("kw_ct"))
        .select(col("window.start").as("ws"), col("keyword"), col("kw_ct"))
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      val got = drainSink(q, "kw_out", batch.size)
        .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      // the CJK bigrams came through the streaming path too
      assert(batch.exists(_._2 == "大数") && batch.exists(_._2 == "数据"))
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** T2 — monotonous (ascending-timestamps) watermark: the reference's
  * `WatermarkStrategy.forMonotonousTimestamps` (used for streams whose event
  * time never regresses) is `withWatermark(_, "0 seconds")` in Spark — zero
  * allowed out-of-orderness, so the watermark rides the max seen timestamp
  * and any regressing row is late by definition. Complements the T1 bounded
  * out-of-order spec in [[StreamJoinSpec]]. */
class MonotonousWatermarkSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)
  private val base = 1700000000000L

  test("0-second watermark keeps ascending rows and drops a regressing one") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val ev = MemoryStream[(Long, Timestamp)]
    val agg = ev.toDF().toDF("id", "t")
      .withWatermark("t", "0 seconds")
      .groupBy(window(col("t"), "10 seconds"))
      .agg(count(lit(1)).as("ct"))
      .select(col("window.start").as("ws"), col("ct"))

    val q = agg.writeStream.format("memory").queryName("mono_out")
      .outputMode("append").start()
    try {
      // ascending batch inside the first window
      ev.addData((1L, ts(base + 1000)), (2L, ts(base + 2000)))
      q.processAllAvailable()
      // next ascending row crosses into window 2; watermark = base+11s
      // (no delay subtracted) closes window 1 immediately
      ev.addData((3L, ts(base + 11000)))
      q.processAllAvailable()
      // REGRESSING row for the closed window — late under a monotonous
      // watermark, must be dropped (would re-open window 1 otherwise)
      ev.addData((10L, ts(base + 3000)))
      q.processAllAvailable()
      // advance further to close window 2
      ev.addData((4L, ts(base + 25000)))
      q.processAllAvailable()

      val rows = s.table("mono_out").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toSeq
      // window 1 emitted exactly once with the 2 on-time rows (the late row
      // neither re-emitted the window nor bumped the count), window 2 has
      // only the ascending row that opened it
      assert(rows.count(_._1 == base) == 1, s"window 1 must emit once: $rows")
      assert(rows.toMap.get(base) == Some(2L), s"late row leaked into window 1: $rows")
      assert(rows.toMap.get(base + 10000) == Some(1L), s"window 2: $rows")
    } finally q.stop()
  }
}

package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** K3-adjacent streaming operator: `dropDuplicatesWithinWatermark` — at-least-
  * once sources re-deliver records; dedup-by-key within the watermark horizon
  * makes the downstream effectively-once (the streaming twin of the batch
  * last-write-wins compaction). */
class StreamDedupSpec extends SparkSpec {

  test("redelivered records within the watermark are dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = 1700000000000L
    def ts(ms: Long) = new Timestamp(ms)

    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("id", "t")
      .withWatermark("t", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(base)), (2L, ts(base + 1000)))
      q.processAllAvailable()
      mem.addData((1L, ts(base + 2000)), (2L, ts(base + 500)), (3L, ts(base + 3000)))
      q.processAllAvailable()
      val got = s.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(1L, 2L, 3L), s"got ${got.toSeq}")
    } finally q.stop()
  }
}

package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** T7 — exactly-once sink semantics from foreachBatch + idempotent atomic
  * commits: a crash-replayed micro-batch (same batchId, same data) must not
  * duplicate output, and a restarted query continues from the checkpoint
  * without re-emitting committed batches. */
class TxnSinkSpec extends SparkSpec {

  test("replayed micro-batch commits exactly once; restart resumes cleanly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = Files.createTempDirectory("txnsink").toString + "/out"
    val ckpt = Files.createTempDirectory("txnsink_ckpt").toString

    val in = MemoryStream[Long]
    def start() = in.toDF().toDF("v").writeStream
      .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) => {
        TxnSink.commitBatch(b, out, id); ()
      })
      .option("checkpointLocation", ckpt)
      .start()

    def values(): Seq[Long] =
      TxnSink.read(s, out).get.collect().map(_.getAs[Long]("v")).toSeq.sorted

    val q1 = start()
    try {
      in.addData(1L, 2L, 3L)
      q1.processAllAvailable()
      assert(values() == Seq(1L, 2L, 3L))

      // crash-replay: the SAME batch delivered again (same id, same rows) —
      // the commit must be a no-op, not a duplicate
      val batch = s.createDataFrame(Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L))).toDF("v")
      assert(!TxnSink.commitBatch(batch, out, 0L), "replay must be a no-op")
      assert(values() == Seq(1L, 2L, 3L), "replay must not duplicate rows")
    } finally q1.stop()

    // restart from the checkpoint: committed batches stay committed, new data
    // lands in new batch ids
    val q2 = start()
    try {
      in.addData(4L, 5L)
      q2.processAllAvailable()
      assert(values() == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q2.stop()
  }
}

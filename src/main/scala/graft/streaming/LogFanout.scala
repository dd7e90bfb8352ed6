package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.Split

/** X1 streaming form — the reference's 5-way side-output split
  * (`DwdBaseLog.splitLog:76-133`, sinks wired :69-73) as ONE pass per
  * micro-batch fanned out to five sinks inside `foreachBatch`: the batch is
  * pinned once, each branch is a filtered projection, no re-read of the
  * source per branch. */
object LogFanout {

  def writer(valid: DataFrame, outRoot: String): DataStreamWriter[Row] =
    valid.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val b = batch.persist()
      try {
        Split.pageBranch(b).write.mode("append").parquet(s"$outRoot/page")
        Split.startBranch(b)
          .select(col("event_id"), col("common"), col("start"), col("ts"))
          .write.mode("append").parquet(s"$outRoot/start")
        Split.errBranch(b)
          .select(col("event_id"), col("common"), col("err"), col("ts"))
          .write.mode("append").parquet(s"$outRoot/err")
        Split.explodeWithParent(b, col("displays"),
            Seq(col("event_id"), col("common"), col("ts")), "display")
          .write.mode("append").parquet(s"$outRoot/display")
        Split.explodeWithParent(b, col("actions"),
            Seq(col("event_id"), col("common"), col("ts")), "action")
          .write.mode("append").parquet(s"$outRoot/action")
      } finally { b.unpersist(); () }
    }
}

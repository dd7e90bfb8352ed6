package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.ops.Split

/** X1 streaming form — the reference's 5-way side-output split
  * (`DwdBaseLog.splitLog:76-133`, sinks wired :69-73) as ONE pass per
  * micro-batch fanned out to five sinks inside `foreachBatch`: the batch is
  * pinned once, each branch is a filtered projection, no re-read of the
  * source per branch.
  *
  * Branch payloads mirror the reference exactly: err gets the WHOLE record
  * (`:81-84`), start gets the record minus err (`:90-96` runs after the err
  * removal), display/action rows carry the parent `common`, `page` and `ts`
  * (`:98-121`), and page gets the record minus err/start/displays/actions
  * (`:123-129`).
  *
  * Each branch commits through [[TxnSink]] keyed by the micro-batch id, so a
  * crash-replayed batch is a no-op per branch — plain `mode("append")` writes
  * would duplicate whichever branches committed before the crash. */
object LogFanout {

  def writer(valid: DataFrame, outRoot: String): DataStreamWriter[Row] =
    valid.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val b = batch.persist()
      try {
        TxnSink.commitBatch(Split.errBranch(b), s"$outRoot/err", id)
        TxnSink.commitBatch(Split.startBranch(b).drop("err"), s"$outRoot/start", id)
        TxnSink.commitBatch(
          Split.explodeWithParent(b, col("displays"),
            Seq(col("event_id"), col("common"), col("page"), col("ts")), "display"),
          s"$outRoot/display", id)
        TxnSink.commitBatch(
          Split.explodeWithParent(b, col("actions"),
            Seq(col("event_id"), col("common"), col("page"), col("ts")), "action"),
          s"$outRoot/action", id)
        TxnSink.commitBatch(Split.pageBranch(b), s"$outRoot/page", id)
        ()
      } finally { b.unpersist(); () }
    }
}

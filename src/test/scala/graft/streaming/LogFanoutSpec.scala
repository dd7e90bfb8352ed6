package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.model.Envelopes
import graft.ops.{Project, Split}

/** X1 streaming fan-out: the five branch sinks receive exactly the batch
  * split's rows from one streamed pass. */
class LogFanoutSpec extends SparkSpec {

  test("one streamed pass populates all five branch sinks to batch parity") {
    val s = spark
    val in = Files.createTempDirectory("fan_in").toString
    val out = Files.createTempDirectory("fan_out").toString

    val valid = Project.logEtl(Envelopes.logRecords(s, sfDir()))
    valid.write.mode("overwrite").parquet(in)
    val schema = valid.schema

    val q = LogFanout.writer(s.readStream.schema(schema).parquet(in), out)
      .option("checkpointLocation", Files.createTempDirectory("fan_ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // branches commit through TxnSink (batch=<id> dirs); an empty branch
    // still commits an empty batch dir with the branch schema
    def branch(p: String) = TxnSink.read(s, s"$out/$p")
    def n(p: String) = branch(p).map(_.count()).getOrElse(0L)
    assert(n("page") == Split.pageBranch(valid).count())
    assert(n("start") == Split.startBranch(valid).count())
    assert(n("err") == Split.errBranch(valid).count())
    assert(n("display") == Split.explodeWithParent(valid, col("displays"),
      Seq(col("event_id")), "d").count())
    assert(n("action") == Split.explodeWithParent(valid, col("actions"),
      Seq(col("event_id")), "a").count())
    assert(n("page") > 0 && n("start") > 0 && n("display") > 0 && n("action") > 0)

    // reference payload parity: display/action rows carry the parent page
    // context (DwdBaseLog.java:98-121) and the start branch keeps the whole
    // record minus err (:90-96 runs after the err removal)
    assert(branch("display").get.columns.contains("page"))
    assert(branch("action").get.columns.contains("page"))
    val startCols = branch("start").get.columns.toSet
    assert(startCols.contains("start") && startCols.contains("page") &&
      !startCols.contains("err"), s"start branch columns: $startCols")
  }
}

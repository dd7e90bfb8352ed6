package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes
import graft.ops.{Project, Stateful}
import graft.streaming.IsNewFix.LogEvent

/** T5 streaming form: flatMapGroupsWithState state rules across micro-batches,
  * and equivalence with the batch window form. */
class IsNewFixStreamSpec extends SparkSpec {

  private def run(batches: Seq[Seq[LogEvent]]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[LogEvent]
    val q = IsNewFix(mem.toDS()).writeStream
      .format("memory").queryName("isnew_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("isnew_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("is_new_fixed")).toMap
    } finally q.stop()
  }

  private val d1 = 1700000000000L // 2023-11-14
  private val d2 = d1 + 86400000L

  test("state rules across micro-batches match the reference's ValueState logic") {
    val got = run(Seq(
      Seq(LogEvent("A", "1", d1, 1), LogEvent("A", "1", d1 + 1000, 2), // first day: keep 1
        LogEvent("B", "0", d1, 3)),                                     // old visitor: 0
      Seq(LogEvent("A", "1", d2, 4),  // next day, still claiming new → rewritten to 0
        LogEvent("B", "1", d2, 5),    // B's state = yesterday(d1) ≠ today → 0
        LogEvent("C", "1", d2, 6))))  // brand new → 1
    assert(got == Map(1L -> "1", 2L -> "1", 3L -> "0", 4L -> "0", 5L -> "0", 6L -> "1"))
  }

  test("single-replay streaming result equals the batch window form") {
    val s = spark
    import s.implicits._
    val lg = Project.logEtl(Envelopes.logRecords(s, sfDir()))
      .select(col("common.mid").as("mid"), col("common.is_new").as("is_new"),
        col("ts"), col("event_id"))
    val events = lg.as[LogEvent].collect().toSeq.sortBy(e => (e.ts, e.event_id))
    val streamed = run(Seq(events))
    val batch = Stateful.isNewFixBatch(
        lg.withColumn("dt", date_format(timestamp_millis(col("ts")), "yyyy-MM-dd")),
        col("mid"), col("dt"), col("is_new"))
      .select(col("event_id"), col("is_new_fixed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == batch)
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Joins

/** J4/T3 — lookup-join temporal semantics: the dim snapshot is re-resolved
  * per micro-batch (`FOR SYSTEM_TIME AS OF proc_time`,
  * `DwdInteractionCommentInfo.lookUpJoin:64-80`): a dim update lands between
  * batches and the next batch sees it, with no retraction of earlier output. */
class LookupRefreshSpec extends SparkSpec {

  test("dim updates become visible to the next micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    @volatile var dimRows = Seq(("1", "good"), ("2", "ok"))
    def dimSnapshot(): DataFrame = dimRows.toDF("rowkey", "dic_name")

    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "appraise")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Joins.lookup(batch, dimSnapshot(), col("appraise") === col("rowkey"))
          .select(col("id"), col("dic_name"))
          .write.mode("append").saveAsTable("lookup_out")
      }
      .start()
    try {
      mem.addData((10L, "1"), (11L, "2"))
      q.processAllAvailable()
      dimRows = Seq(("1", "great"), ("2", "ok"))   // dim update between batches
      mem.addData((12L, "1"))
      q.processAllAvailable()
      val got = s.table("lookup_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == Map(10L -> "good", 11L -> "ok", 12L -> "great"))
    } finally {
      q.stop()
      s.sql("DROP TABLE IF EXISTS lookup_out")
    }
  }
}

package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.IsNewFix.LogEvent

/** T5 on the modern Spark 4 state API: `transformWithState` with a named
  * `ValueState[String]` over the RocksDB provider must reproduce the
  * `flatMapGroupsWithState` implementation record for record across
  * micro-batches — the forward-path parity that lets the engine migrate
  * state APIs without a semantic change. */
class IsNewFixTwsSpec extends SparkSpec {

  private def runTws(batches: Seq[Seq[LogEvent]]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[LogEvent]
    val q = IsNewFixTws(mem.toDS()).writeStream
      .format("memory").queryName("isnew_tws_out").outputMode("append")
      // transformWithState requires the RocksDB provider; scope it to this
      // query's checkpoint rather than the shared session
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("tws_ckpt").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("isnew_tws_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("is_new_fixed")).toMap
    } finally q.stop()
  }

  private def runFmgws(batches: Seq[Seq[LogEvent]]): Map[Long, String] = {
    val s = spark
    import s.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = s
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[LogEvent]
    val q = IsNewFix(mem.toDS()).writeStream
      .format("memory").queryName("isnew_fmgws_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("isnew_fmgws_out").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("is_new_fixed")).toMap
    } finally q.stop()
  }

  private val d1 = 1700000000000L
  private val d2 = d1 + 86400000L

  private val batches = Seq(
    Seq(LogEvent("A", "1", d1, 1), LogEvent("A", "1", d1 + 1000, 2),
      LogEvent("B", "0", d1, 3),
      LogEvent("D", "0", d1, 7), LogEvent("D", "1", d1 + 1000, 8)),
    Seq(LogEvent("A", "1", d2, 4), LogEvent("B", "1", d2, 5),
      LogEvent("C", "1", d2, 6)))

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState over RocksDB matches flatMapGroupsWithState record for record") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val tws = runTws(batches)
      assert(tws == Map(1L -> "1", 2L -> "1", 3L -> "0", 4L -> "0", 5L -> "0",
        6L -> "1", 7L -> "0", 8L -> "0"))
      assert(tws == runFmgws(batches))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}

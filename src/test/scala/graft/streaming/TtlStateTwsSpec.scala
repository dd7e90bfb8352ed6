package graft.streaming

import scala.concurrent.duration._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** J7 on the modern Spark 4 state API: `transformWithState` with named
  * `ListState` buffers and a refresh-on-touch processing-time timer must
  * reproduce the `flatMapGroupsWithState` TTL join pair for pair — the same
  * forward-path parity contract `IsNewFixTwsSpec` pins for T5. Both queries
  * consume the SAME MemoryStreams (each tracks its own offsets) over the
  * RocksDB provider, so every phase asserts the two sinks agree.
  *
  * Pacing follows `TtlStateSpec`: timer-driven queries re-trigger
  * continuously, so the spec polls the sinks with deadlines and sizes the
  * TTL generously enough that a loaded box cannot evict during a live-join
  * phase.
  */
class TtlStateTwsSpec extends SparkSpec {

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState TTL join matches flatMapGroupsWithState pair for pair") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)

    val left = MemoryStream[(Long, String)]
    val right = MemoryStream[(Long, String)]
    val legacy = TtlState.ttlJoin(left.toDS(), right.toDS(), ttl = 8.seconds)
    val modern = TtlStateTws.ttlJoin(left.toDS(), right.toDS(), ttl = 8.seconds)

    def start(df: org.apache.spark.sql.DataFrame, name: String) =
      df.writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(Trigger.ProcessingTime("200 milliseconds"))
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"${name}_ckpt").toString)
        .start()

    val ql = start(legacy.toDF("k", "l", "r"), "ttl_legacy_out")
    val qm = start(modern.toDF("k", "l", "r"), "ttl_modern_out")

    def rows(table: String): Set[(Long, String, String)] =
      s.table(table).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    def awaitBoth(expected: Set[(Long, String, String)], what: String): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (System.currentTimeMillis < deadline &&
        (rows("ttl_legacy_out") != expected || rows("ttl_modern_out") != expected))
        Thread.sleep(200)
      assert(rows("ttl_legacy_out") == expected,
        s"$what (legacy): got ${rows("ttl_legacy_out")}")
      assert(rows("ttl_modern_out") == expected,
        s"$what (modern): got ${rows("ttl_modern_out")}")
    }

    try {
      // live-key join: both implementations pair (1,a) with (1,x)
      left.addData((1L, "a"))
      right.addData((1L, "x"))
      awaitBoth(Set((1L, "a", "x")), "live-key join")

      // idle k1 past the 8 s TTL: the legacy timeout and the modern timer
      // must BOTH evict the key's buffers
      Thread.sleep(12000)

      // probe the evicted key: neither implementation may rejoin "a"
      right.addData((1L, "y"))
      Thread.sleep(3000) // bounded grace for a wrong emission to surface
      assert(rows("ttl_legacy_out") == Set((1L, "a", "x")),
        s"evicted key must not rejoin (legacy): ${rows("ttl_legacy_out")}")
      assert(rows("ttl_modern_out") == Set((1L, "a", "x")),
        s"evicted key must not rejoin (modern): ${rows("ttl_modern_out")}")

      // the fresh right row re-opened k1: a new left row joins in both
      left.addData((1L, "b"))
      awaitBoth(Set((1L, "a", "x"), (1L, "b", "y")), "re-opened key join")
    } finally {
      ql.stop(); qm.stop()
      prev match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

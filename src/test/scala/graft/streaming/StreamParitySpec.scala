package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.model.Envelopes
import graft.ops.Project

/** §7.2 step 9 — streaming parity: the SAME operator functions run under
  * Structured Streaming (file source of raw envelope JSON → decode → DWD
  * pipeline, Trigger.AvailableNow) and produce exactly the batch result. */
class StreamParitySpec extends SparkSpec {

  test("file-streamed Maxwell envelopes through cart-add equal the batch query") {
    val s = spark
    val dir = Files.createTempDirectory("mxstream").toString

    // lay the envelope down as raw JSON lines (the Kafka `value` stand-in)
    Envelopes.maxwell(s, sfDir()).select(to_json(struct(
        col("database"), col("table"), col("type"), col("data"), col("old"), col("ts")))
        .as("value"))
      .coalesce(2).write.mode("overwrite").text(dir)

    def cartAdd(mx: org.apache.spark.sql.DataFrame) =
      Project.cartIncreaseOnly(
          Project.routeFilter(mx, "cart_info", Seq("insert", "update")))
        .select(element_at(col("data"), "id").as("id"),
          element_at(col("data"), "user_id").as("user_id"),
          element_at(col("data"), "sku_id").as("sku_id"),
          Project.cartAddDelta.as("sku_num"), col("ts"))

    val streamed = Streams.decodeMaxwell(s.readStream.text(dir))
    val q = cartAdd(streamed).writeStream
      .format("memory").queryName("cart_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
    val got = s.table("cart_stream").collect().map(key).sorted
    val want = cartAdd(Envelopes.maxwell(s, sfDir())).collect().map(key).sorted
    assert(got.length == want.length && got.sameElements(want))
    assert(want.nonEmpty)
  }

  test("payment-success composite under streaming equals the batch composite") {
    val s = spark
    val dir = Files.createTempDirectory("paystream").toString

    // raw Maxwell JSON lines, as the Kafka value would carry them
    Envelopes.maxwell(s, sfDir()).select(to_json(struct(
        col("database"), col("table"), col("type"), col("data"), col("old"), col("ts")))
        .as("value"))
      .coalesce(2).write.mode("overwrite").text(dir)

    // the payment branch of q_dwd_pay_suc (DwdTradeOrderPaySucDetail:192-194):
    // stream-decode, CDC-transition filter, typed projection
    def payBranch(mx: org.apache.spark.sql.DataFrame) =
      Project.cdcTransition(
          Project.routeFilter(mx, "cart_info", Seq("update")),
          "payment_status", "1602")
        .select(element_at(col("data"), "id").as("pay_id"),
          element_at(col("data"), "order_id").cast("long").as("order_id"),
          (col("ts") * 1000).as("p_ts"))

    val q = payBranch(Streams.decodeMaxwell(s.readStream.text(dir)))
      .writeStream.format("memory").queryName("pay_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1), r.getLong(2))
    val got = s.table("pay_stream").collect().map(key).sorted
    val want = payBranch(Envelopes.maxwell(s, sfDir())).collect().map(key).sorted
    assert(want.nonEmpty && got.sameElements(want))

    // the downstream interval join + lookup-left run on the streamed payment
    // rows exactly as in batch (stream-stream interval join semantics are
    // covered in StreamJoinSpec; here we pin end-to-end value parity)
    val streamedPay = s.table("pay_stream")
    val od = Envelopes.orderDetail(s, sfDir()).select(
      col("id"), col("order_id").as("od_order_id"), (col("ts") * 1000).as("od_ts"))
    val joined = graft.ops.Joins.interval(streamedPay, od,
      (col("order_id"), col("od_order_id")), (col("p_ts"), col("od_ts")),
      lowerMs = 15 * 60 * 1000L, upperMs = 5000L)
    val batchJoined = graft.ops.Joins.interval(
      payBranch(Envelopes.maxwell(s, sfDir())), od,
      (col("order_id"), col("od_order_id")), (col("p_ts"), col("od_ts")),
      lowerMs = 15 * 60 * 1000L, upperMs = 5000L)
    assert(joined.count() == batchJoined.count() && joined.count() > 0)
  }

  test("watermarked streaming window aggregation equals batch on closed windows") {
    val s = spark
    val dir = Files.createTempDirectory("evstream").toString
    // stream the events table (copied out so readStream sees one-table dir)
    val ev = Envelopes.events(s, sfDir())
    ev.write.mode("overwrite").parquet(dir)
    val schema = ev.schema

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("ct"))
        .select(col("window.start").as("ws"), col("event_type"), col("ct"))

    val q = agg(s.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("win_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getTimestamp(0).getTime, r.getString(1)) -> r.getLong(2)).toMap
    val streamed = toMap(s.table("win_parity").collect())
    val batch = toMap(agg(ev).collect())
    // append mode emits a window only once the watermark passes its end; the
    // final watermark stops 10 min short of max ts, so the last open window(s)
    // stay unemitted — every emitted window must match batch exactly, and all
    // provably-closed windows must have been emitted.
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(batch.get(k).contains(v), s"window $k") }
    val maxTs = ev.agg(max(expr("unix_millis(ts)"))).head().getLong(0)
    val closed = batch.filter { case ((ws, _), _) => ws + 3600000L <= maxTs - 600000L }
    closed.foreach { case (k, v) => assert(streamed.get(k).contains(v), s"missing closed window $k") }
  }
}

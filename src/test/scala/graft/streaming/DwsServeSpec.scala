package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.model.Envelopes

/** §2.9 + K3/K6 end-to-end: the reference's DWS layer streams windowed
  * aggregates into an upsert serving store (Doris; `Constant.java:34-37`).
  * Here: watermarked tumbling window aggregation in UPDATE mode →
  * foreachBatch upsert into the keyed store (each re-emission of a window
  * overwrites the previous value, exactly upsert-sink semantics) → final
  * store contents equal the batch aggregation. */
class DwsServeSpec extends SparkSpec {

  test("streamed windowed aggregation upserted into the keyed store equals batch") {
    val s = spark
    val evDir = Files.createTempDirectory("dws_serve_in").toString
    val store = Files.createTempDirectory("dws_serve_store").toString + "/dws"

    val ev = Envelopes.events(s, sfDir())
    ev.write.mode("overwrite").parquet(evDir)

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("ct"))
        .select(unix_timestamp(col("window.start")).as("ws"),
          col("event_type"), col("ct"))

    val q = agg(s.readStream.schema(ev.schema).parquet(evDir)
        .withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("update")
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, id: Long) => {
        KeyedStore.merge(
          batch.withColumn("op_type", lit("put")).withColumn("seq", lit(id)),
          store, keys = Seq("ws", "event_type"), seqCols = Seq("seq"))
        ()
      })
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def toMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("ws"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("ct")).toMap
    val served = toMap(KeyedStore.readActive(s, store).get.collect())
    val batch = toMap(agg(ev).collect())
    // update mode re-emits every touched window per batch; the upsert store
    // keeps the LAST value per key, so the final state is the full count for
    // every window — exact equality with batch, open windows included
    assert(served == batch, s"served=${served.size} batch=${batch.size}")
    assert(served.nonEmpty)
  }
}

package graft.dim

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.model.Envelopes
import graft.streaming.{KeyedStore, Streams}

/** §2.7 under Structured Streaming: envelope JSON file stream → foreachBatch →
  * config re-resolved per batch → keyed stores; final state equals the batch
  * backfill over the same data (`DimAPP.handle:48-80` end-to-end). */
class DimRouterStreamSpec extends SparkSpec {

  test("foreachBatch-driven routing converges to the batch backfill state") {
    val s = spark
    val in = Files.createTempDirectory("dimstream_in").toString
    val streamRoot = Files.createTempDirectory("dimstream_s").toString
    val batchRoot = Files.createTempDirectory("dimstream_b").toString

    val mx = Envelopes.maxwell(s, sfDir())
    mx.select(to_json(struct(
        col("database"), col("table"), col("type"), col("data"), col("old"), col("ts")))
        .as("value"))
      .coalesce(4).write.mode("overwrite").text(in)

    // the reference re-resolves config per record; we re-resolve per micro-batch
    def currentConfig(): DataFrame = Envelopes.configDim(s)

    val q = Streams.decodeMaxwell(s.readStream.text(in))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        DimRouter.applyBatch(batch.drop("row_time"), currentConfig(), streamRoot): Unit
      }
      .option("checkpointLocation", Files.createTempDirectory("dimstream_ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    DimRouter.applyBatch(mx, currentConfig(), batchRoot)

    def snap(root: String) =
      KeyedStore.read(s, s"$root/dim_cart_info").get
        .select(col("row_key"), element_at(col("data"), "sku_num").as("v"), col("ts"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val streamed = snap(streamRoot)
    val batch = snap(batchRoot)
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}

package graft.dim

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes
import graft.streaming.KeyedStore

/** §2.7 composite: config-driven routing end-to-end over the envelope fixture,
  * including column pruning, keyed merge with tombstone retention, and op='d'
  * table drop (K5). */
class DimRouterSpec extends SparkSpec {

  test("routes CDC rows into per-table keyed stores with pruned columns") {
    val s = spark
    val root = Files.createTempDirectory("dimstore").toString
    val cdc = Envelopes.maxwell(s, sfDir())
    val cfg = Envelopes.configDim(s)

    val tables = DimRouter.applyBatch(cdc, cfg, root)
    assert(tables == Seq("dim_cart_info")) // only cart_info rows exist in the fixture

    val raw = KeyedStore.read(s, s"$root/dim_cart_info").get
    val active = KeyedStore.readActive(s, s"$root/dim_cart_info").get
    // pruning: only the configured sink columns survive in the data map
    val keys = active.select(explode(map_keys(col("data"))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("id", "sku_id", "sku_num"))
    // tombstones are retained in storage but hidden from the live view
    assert(raw.filter(col("op_type") === "delete").count() > 0)
    assert(active.filter(col("op_type") === "delete").count() == 0)
    // row_key is the configured sinkRowKey ('id') value
    assert(active.filter(col("row_key") =!= element_at(col("data"), "id")).count() == 0)

    // config update: op='d' drops the sink table
    val dropCfg = cfg.withColumn("op",
      when(col("sinkTable") === "dim_cart_info", "d").otherwise(col("op")))
    DimRouter.applyBatch(cdc, dropCfg, root)
    assert(KeyedStore.read(s, s"$root/dim_cart_info").isEmpty)
  }

  test("op='u' is drop+create: narrowed sinkColumns leave no stale wide rows") {
    val s = spark
    val root = Files.createTempDirectory("dimstore_u").toString
    val cdc = Envelopes.maxwell(s, sfDir())
    val cfg = Envelopes.configDim(s)

    // batch 1: initial config writes the wide (id, sku_id, sku_num) rows
    DimRouter.applyBatch(cdc, cfg, root)

    // batch 2: 'u' narrows sinkColumns to (id, sku_id). The reference drops
    // and recreates the HBase table (`DimAPP.createHBaseTable:152-156`), so
    // rows written under the old config must NOT survive — not even for keys
    // this batch doesn't touch.
    val narrowCfg = cfg
      .withColumn("op", when(col("sinkTable") === "dim_cart_info", "u").otherwise(col("op")))
      .withColumn("sinkColumns",
        when(col("sinkTable") === "dim_cart_info", "id,sku_id").otherwise(col("sinkColumns")))
    // batch 2 touches only a SUBSET of keys — the stale rows at risk are the
    // ones this batch never rewrites
    val partialCdc = cdc.filter(element_at(col("data"), "order_id").cast("long") % 2 === 0)
    val tables = DimRouter.applyBatch(partialCdc, narrowCfg, root)
    assert(tables == Seq("dim_cart_info"))

    val active = KeyedStore.readActive(s, s"$root/dim_cart_info").get
    val keys = active.select(explode(map_keys(col("data"))).as("k"))
      .distinct().collect().map(_.getString(0)).sorted
    assert(keys.toSeq == Seq("id", "sku_id"), s"stale wide rows survived: $keys")
    // and the untouched keys are gone with the dropped table, like HBase
    assert(active.filter(element_at(col("data"), "order_id").cast("long") % 2 =!= 0).count() == 0)
  }
}

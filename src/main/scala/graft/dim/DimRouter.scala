package graft.dim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Joins, Project}
import graft.streaming.KeyedStore

/** §2.7 — the config-driven DIM routing engine, the reference's one composite
  * operator (`DimAPP.handle:48-80`): CDC stream → ETL → broadcast config join
  * (`DimBroadcastFunction.java:26-97`) → per-row column pruning
  * (`DimAPP.filterColumn:82-95`) → keyed put/delete per sink table
  * (`DimHBaseSinkFunction.java:39-75`).
  *
  * The reference's cold-start preload + MapState update dance collapses into
  * "resolve the current config per micro-batch": the config is tiny (one row
  * per dimension table), so re-reading and re-broadcasting it each batch is
  * free and gives the same read-your-config-writes semantics. `op='d'` config
  * rows drop the route (K5's DROP TABLE becomes store removal).
  */
object DimRouter {

  /** Pure routing core: ETL-filtered CDC rows joined to active config routes,
    * data map pruned to each route's `sinkColumns`, keyed by the route's
    * `sinkRowKey`. */
  def route(cdc: DataFrame, config: DataFrame): DataFrame = {
    val active = config.filter(col("op") =!= "d")
    val joined = Joins.broadcastConfig(Project.etlFilter(cdc), active,
      col("table") === col("sourceTable"))
    // row_key resolves AFTER pruning, like the reference (the HBase sink
    // reads the pruned map, `DimHBaseSinkFunction.java:44-48`) — and like the
    // reference, a config whose sinkColumns csv omits its own sinkRowKey is a
    // LOUD error (HBase Put(null) throws there; silently last-write-winning
    // every row into one NULL key would lose the whole table here).
    Project.pruneColumns(joined, col("sinkColumns"))
      .select(
        col("sinkTable").as("sink_table"),
        when(expr("element_at(data, sinkRowKey)").isNull,
          raise_error(concat(lit("DimRouter: sinkRowKey '"), col("sinkRowKey"),
            lit("' missing from pruned data of "), col("sinkTable"),
            lit(" — sinkColumns must include the row key"))))
          .otherwise(expr("element_at(data, sinkRowKey)")).as("row_key"),
        col("type").as("op_type"),
        col("data"),
        col("ts"),
        // total-order tiebreak: (ts, op_type) can tie for a duplicated row key,
        // and the winning VALUE must not depend on micro-batch boundaries
        to_json(col("data")).as("payload"))
  }

  /** One micro-batch of the full DIM pipeline: route, then apply puts/deletes
    * into one keyed store per sink table under `storeRoot`. Call from
    * `foreachBatch` (streaming) or once (batch backfill). */
  def applyBatch(cdc: DataFrame, config: DataFrame, storeRoot: String): Seq[String] = {
    val spark = cdc.sparkSession
    // K5 — DDL-on-stream (`DimAPP.createHBaseTable:117-182`): a config row with
    // op='d' drops the sink table; op='u' is drop+CREATE (`:152-156` deletes
    // the old table before recreating it) — the store is wiped here so a
    // narrowed sinkColumns cannot leave stale wide rows, then THIS batch's
    // routed rows rebuild it ('u' routes stay active in route()).
    val dropped = config.filter(col("op").isin("d", "u"))
      .select("sinkTable").collect().map(_.getString(0))
    if (dropped.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(storeRoot)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      dropped.foreach { t =>
        Seq("", "__bak", "__tmp").foreach(sfx =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$storeRoot/$t$sfx"), true))
      }
    }
    val routed = route(cdc, config).cache()
    try {
      val tables = routed.select("sink_table").distinct().collect().map(_.getString(0))
      tables.foreach { t =>
        KeyedStore.merge(
          routed.filter(col("sink_table") === t)
            .select(col("row_key"), col("op_type"), col("data"), col("ts"), col("payload")),
          s"$storeRoot/$t",
          keys = Seq("row_key"),
          seqCols = Seq("ts", "op_type", "payload"))
      }
      tables.toSeq
    } finally routed.unpersist()
  }
}

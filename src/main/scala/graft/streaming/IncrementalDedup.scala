package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-batch exact deduplication for CONTINUOUS ingest — the streaming
  * complement to `ext/Dedup.exact`: a batch pipeline dedups a corpus it can
  * see whole, but a crawler/firehose pipeline must reject re-arrivals of
  * content it accepted in ANY earlier micro-batch, across restarts. Spark's
  * built-in `dropDuplicates` on a stream holds its seen-set in query state
  * bounded by the watermark; this operator instead persists the accepted
  * fingerprint set in a [[KeyedStore]], so the dedup horizon is unbounded,
  * survives restarts (and even different queries), and stays inspectable as
  * a table.
  *
  * Per-batch cost: one window over the BATCH (batch-sized, not state-sized)
  * for within-batch firsts, one anti-join against the store scan, and a
  * KeyedStore merge that rewrites only the buckets the batch touches. The
  * corpus-sized seen-set never shuffles as a whole — the anti-join shuffles
  * the batch against the store's bucketed files, and at scale the store side
  * prunes to the buckets the batch's fingerprints hash into (the same
  * bucket-pruned read `DimCache` uses).
  */
object IncrementalDedup {

  /** Dedup one micro-batch against the store at `storePath` (creating it on
    * first use), append the survivors' fingerprints, and return the
    * surviving rows. Within a batch, the first row per fingerprint in
    * `ordCol` order wins — deterministic under any partitioning.
    *
    * The survivors are eagerly `localCheckpoint`ed before the fingerprint
    * merge: the merge is an action, and without pinning, the caller's later
    * consumption would recompute the anti-join AGAINST THE ALREADY-UPDATED
    * store and return zero rows. */
  def dedupBatch(batch: DataFrame, storePath: String, fpCol: Column,
      ordCol: Column, batchId: Long, numBuckets: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val withFp = batch.withColumn("__fp", fpCol)
    val firsts = withFp
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__fp")).orderBy(ordCol)))
      .filter(col("__rk") === 1).drop("__rk")
    // PRUNED read: only the store buckets the batch's fingerprints hash
    // into are opened (the store is created with bucketCols = fp below), so
    // the screen is O(batch) file IO at any index size.
    val fresh = (KeyedStore.readPruned(spark, storePath,
        firsts.select(col("__fp").as("fp"))) match {
      case Some(seen) => firsts.join(seen.select(col("fp").as("__fp")),
        Seq("__fp"), "left_anti")
      case None => firsts
    }).localCheckpoint(true)
    val newFps = fresh.select(col("__fp").as("fp"))
      .withColumn("batch_id", lit(batchId))
    if (!newFps.isEmpty)
      KeyedStore.merge(newFps, storePath, keys = Seq("fp"),
        seqCols = Seq("batch_id"), numBuckets = numBuckets,
        bucketCols = Seq("fp"))
    fresh.drop("__fp")
  }
}

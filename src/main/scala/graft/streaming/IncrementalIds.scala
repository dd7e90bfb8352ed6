package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stable dense id minting for streaming keys — the growing-vocabulary
  * primitive (token → embedding-row, host → node id, label → class index):
  * each fold assigns the batch's UNSEEN keys the next dense ids
  * (max stored id + lexicographic rank within the fold) and never touches
  * an existing assignment, so ids are dense, collision-free, and STABLE
  * across any number of folds — the property a feature store needs that
  * hashing can't give (hashes collide) and re-ranking can't give (ids
  * would shift as the corpus grows).
  *
  * Determinism: an id is a pure function of the key's FIRST fold and its
  * lexicographic rank among that fold's new keys, so a fixed batch split
  * replays to identical ids. Folds are IDEMPOTENT by set semantics (a
  * re-folded batch has no unseen keys) — the [[IncrementalCc]] stance, no
  * high-water mark. A fold that mints nothing writes nothing.
  *
  * Scale posture: one distinct + anti-join against the stored mapping
  * (bucket-pruned store read), then a rank over the fold's NEW keys only
  * — new-keys-per-fold is the unit of work (Heaps-law bounded for token
  * vocabularies), never the corpus or the accumulated mapping; measured
  * flat over a 12× store (`ScaleProbe idmint`, SCALING.md). The next-id
  * read does scan the store's id column (columnar, one column) — at
  * billion-key scale pin the max id in a meta row instead, the
  * [[IncrementalHist]] meta pattern. */
object IncrementalIds {

  /** The stored key → id mapping without folding (empty if never run). */
  def readIds(spark: SparkSession, storePath: String): DataFrame =
    KeyedStore.read(spark, storePath)
      .map(_.select(col("key"), col("id")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, Long)].toDF("key", "id")
      }

  /** Fold one batch: mint ids for unseen keys, return the FULL updated
    * mapping (a lazy store read — callers that outlive the store
    * checkpoint at the call site). */
  def mergeBatch(batch: DataFrame, storePath: String, keyCol: Column,
      numBuckets: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val stored = KeyedStore.read(spark, storePath)
      .map(_.select(col("key"), col("id"), col("ver")).localCheckpoint(true))
    val nextId = stored
      .flatMap(s => Option(s.agg(max(col("id"))).head().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    val nextVer = stored
      .flatMap(s => Option(s.agg(max(col("ver"))).head().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(0L)
    val keys = batch.select(keyCol.cast("string").as("key"))
      .filter(col("key").isNotNull).distinct()
    val fresh = (stored match {
      case Some(s) => keys.join(s.select(col("key")), Seq("key"), "left_anti")
      case None => keys
    })
      .withColumn("id", lit(nextId) + row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("key"))) - 1)
      .withColumn("ver", lit(nextVer))
      .localCheckpoint(true) // pin BEFORE the merge mutates the store
    if (!fresh.isEmpty)
      KeyedStore.merge(fresh.withColumn("op_type", lit("put")), storePath,
        keys = Seq("key"), seqCols = Seq("ver"), numBuckets = numBuckets,
        bucketCols = Seq("key"))
    graft.util.Blocks.freeCheckpoint(fresh)
    stored.foreach(graft.util.Blocks.freeCheckpoint)
    readIds(spark, storePath)
  }
}

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
  * Scale posture: the store is touched only through ONE bucket-pruned
  * read per fold — probe = batch keys ∪ the meta key — so a fold costs
  * O(batch-touched buckets) file reads however large the vocabulary
  * grows (the [[IncrementalScd2]] readPruned pattern). The running max
  * id and version are PINNED in a meta row (kind = "m", key = "") rather
  * than scanned, and minting ranks the fold's new keys with the
  * [[graft.ops.Scale.denseIds]] two-level pattern (local rank inside
  * key-prefix buckets + broadcast offsets — a character prefix is a
  * monotone coarsening of lexicographic order), so even the
  * whole-vocabulary BOOTSTRAP fold never funnels through one task's
  * global sort. New-keys-per-fold is the unit of work (Heaps-law bounded
  * for token vocabularies), never the corpus or the accumulated mapping;
  * measured flat over a 12× store (`ScaleProbe idmint`, SCALING.md). */
object IncrementalIds {

  /** The stored key → id mapping without folding (empty if never run). */
  def readIds(spark: SparkSession, storePath: String): DataFrame =
    KeyedStore.read(spark, storePath)
      .map(_.filter(col("kind") === "v").select(col("key"), col("id")))
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
    val keys = batch.select(keyCol.cast("string").as("key"))
      .filter(col("key").isNotNull).distinct()
      // LAZY pin: the pruned read's bucket-probe collect materializes it
      .localCheckpoint(false)
    // ONE bucket-pruned read covers everything the fold needs: the meta
    // row (probed via its fixed key = "" bucket) carries the running max
    // id/version, and the batch keys' buckets hold every stored row an
    // unseen-key anti-join could match. A full-store read here would make
    // each fold O(vocabulary) — the cost this store exists to avoid.
    val probe = keys.unionByName(spark.range(1).select(lit("").as("key")))
    // no checkpoint: every consumer runs BEFORE the merge mutates the
    // store, and the pruned buckets are already immutable parquet —
    // re-reads are column-pruned scans, an eager pin would materialize
    // whole touched buckets per fold
    val pruned = KeyedStore.readPruned(spark, storePath, probe)
      .map(_.select(col("kind"), col("key"), col("id"), col("ver")))
    // running max id / version ride the manifest note (zero Spark jobs;
    // the meta-row collect survives as the pre-note legacy fallback)
    val metaIds: Option[(Long, Long)] = KeyedStore.readNote(spark, storePath)
      .map { n =>
        val m = KeyedStore.Note.decode(n)
        (m("id").toLong, m("ver").toLong)
      }
      .orElse(pruned.flatMap(_.filter(col("kind") === "m")
        .select(col("id"), col("ver")).collect().headOption
        .map(r => (r.getLong(0), r.getLong(1)))))
    val nextId = metaIds.map(_._1 + 1L).getOrElse(0L)
    val nextVer = metaIds.map(_._2 + 1L).getOrElse(0L)
    val freshKeys = pruned match {
      case Some(p) => keys.join(
        p.filter(col("kind") === "v").select(col("key")),
        Seq("key"), "left_anti")
      case None => keys
    }
    // two-level lexicographic rank: a 4-char prefix bucket keeps the
    // bootstrap fold's sort distributed (prefix order IS key order, so
    // bucket offset + local rank = global rank)
    val fresh = graft.ops.Scale.denseIds(freshKeys,
        substring(col("key"), 1, 4), Seq(col("key")), as = "__rk")
      .select(lit("v").as("kind"), col("key"),
        (lit(nextId) + col("__rk")).as("id"), lit(nextVer).as("ver"))
      // LAZY pin: the count below is the one materialization (it computes
      // every partition), still before the merge mutates the store
      .localCheckpoint(false)
    val minted = fresh.count()
    if (minted > 0L) {
      val meta = spark.range(1).select(lit("m").as("kind"),
        lit("").as("key"), lit(nextId + minted - 1L).as("id"),
        lit(nextVer).as("ver"))
      KeyedStore.merge(
        fresh.unionByName(meta).withColumn("op_type", lit("put")), storePath,
        keys = Seq("kind", "key"), seqCols = Seq("ver"),
        numBuckets = numBuckets, bucketCols = Seq("key"),
        note = Some(KeyedStore.Note.encode(
          "id" -> (nextId + minted - 1L).toString,
          "ver" -> nextVer.toString)))
    }
    graft.util.Blocks.freeCheckpoint(fresh)
    graft.util.Blocks.freeCheckpoint(keys)
    readIds(spark, storePath)
  }
}

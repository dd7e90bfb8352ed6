package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch Bloom decontamination — the store form of
  * `ext/Dedup.bloomScreen` for a GROWING eval suite: new benchmark sets
  * arrive over time, and every training batch must be screened against
  * everything registered SO FAR. The persisted state is the filter's
  * set-bit table itself: distinct hash positions (≤ m rows — saturation-
  * bounded regardless of how much eval text ever folds in, the property
  * the batch operator's SCALING.md entry measures), keyed so a fold
  * rewrites only the buckets its NEW positions hash into.
  *
  * The fold is LOSSLESS and ORDER-FREE: a Bloom filter's bit table is a
  * set union, so after any number of folds the screen is bit-identical to
  * the batch operator over the concatenated eval suite (spec-anchored
  * parity) — and re-folding the same batch is a set-union no-op, so no
  * replay high-water mark is needed (idempotent by construction, unlike
  * the counting sketches).
  *
  * (m, k) are the filter's identity — pinned in a meta row on first fold;
  * a fold or screen with different parameters fails fast (positions are
  * `hash % m`, so mixing m values silently corrupts the table).
  *
  * No false negatives at ANY fold count: a contaminated shingle's
  * positions are all present once its eval batch folded. */
object IncrementalBloom {

  private def posCols(m: Int, k: Int) = (0 until k).map(i =>
    conv(substring(md5(col("s")), 1 + 8 * i, 8), 16, 10).cast("long") % m)

  private def liveRows(spark: SparkSession, storePath: String): DataFrame =
    KeyedStore.read(spark, storePath)
      .map(_.select(col("kind"), col("pos"), col("m"), col("k"), col("ver")))
      .getOrElse {
        import spark.implicits._
        Seq.empty[(String, Long, Long, Long, Long)]
          .toDF("kind", "pos", "m", "k", "ver")
      }

  /** (m, k) from the manifest note (zero Spark jobs) when present, else
    * the legacy meta-row collect. */
  private def checkParams(spark: SparkSession, live: DataFrame,
      storePath: String, m: Int, k: Int): Unit =
    KeyedStore.readNote(spark, storePath)
      .map { n =>
        val d = KeyedStore.Note.decode(n)
        (d("m").toLong, d("k").toLong)
      }
      .orElse(live.filter(col("kind") === "m")
        .select(col("m"), col("k")).collect().headOption
        .map(r => (r.getLong(0), r.getLong(1))))
      .foreach { case (sm, sk) =>
        require(sm == m && sk == k,
          s"store $storePath is an (m=$sm, k=$sk) " +
            s"filter; caller passed (m=$m, k=$k) — the parameters are the " +
            "filter's identity")
      }

  /** Fold one eval-suite batch's shingles `evalSh(doc_id, s)` into the
    * filter at `storePath` (created on first use), writing only positions
    * the store lacks. Returns the table's live fill (set positions) so
    * callers can watch saturation against the sizing rule. */
  def addEval(evalSh: DataFrame, storePath: String, m: Int = 1 << 14,
      k: Int = 3, batchId: Long = 0L, numBuckets: Int = 4): Long = {
    require(m >= 2, s"filter needs at least 2 positions, got $m")
    require(k >= 1 && k <= 4, s"md5 yields 4 32-bit slices, got k=$k")
    val spark = evalSh.sparkSession
    // LAZY pin: the merge's stage write (or the legacy params collect)
    // is the one materialization
    val live = liveRows(spark, storePath).localCheckpoint(false)
    checkParams(spark, live, storePath, m, k)
    val batchBits = evalSh
      .select(explode(array(posCols(m, k): _*)).as("pos")).distinct()
    val fresh = batchBits.join(
        live.filter(col("kind") === "v").select(col("pos")),
        Seq("pos"), "left_anti")
      .select(lit("v").as("kind"), col("pos"), lit(m.toLong).as("m"),
        lit(k.toLong).as("k"), lit(batchId).as("ver"))
      // LAZY pin: the merge's own stage write is the one materialization
      .localCheckpoint(false)
    val meta = spark.range(1).select(lit("m").as("kind"), lit(-1L).as("pos"),
      lit(m.toLong).as("m"), lit(k.toLong).as("k"), lit(batchId).as("ver"))
    KeyedStore.merge(fresh.unionByName(meta), storePath,
      keys = Seq("kind", "pos"), seqCols = Seq("ver"),
      numBuckets = numBuckets,
      note = Some(KeyedStore.Note.encode(
        "m" -> m.toString, "k" -> k.toString, "ver" -> batchId.toString)))
    val fill = live.filter(col("kind") === "v").count() + fresh.count()
    graft.util.Blocks.freeCheckpoint(live)
    graft.util.Blocks.freeCheckpoint(fresh)
    fill
  }

  /** Screen one training batch `trainSh(doc_id, s)` against every eval
    * batch folded so far — same output contract as `Dedup.bloomScreen`:
    * (doc_id, shingle_ct, hit_ct, flagged). */
  def screenBatch(trainSh: DataFrame, storePath: String, m: Int = 1 << 14,
      k: Int = 3, minHits: Int = 3): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val spark = trainSh.sparkSession
    val live = liveRows(spark, storePath)
    checkParams(spark, live, storePath, m, k)
    // ≤ m rows; checkpoint so the store scan feeds the k probes once
    val bits = live.filter(col("kind") === "v").select(col("pos"))
      .localCheckpoint(true)
    graft.ext.Dedup.bloomProbe(trainSh, bits, m, k, minHits)
  }
}

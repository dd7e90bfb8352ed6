package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch hashed bigram-LM screening for CONTINUOUS ingest — the
  * streaming complement to `ext/TextStats.hashedLmSurprise`, and the
  * second member of the [[IncrementalDsir]] store-protocol family. The
  * self-LM form: each arriving batch is scored against the language model
  * of ALL PRIOR batches — a distribution-drift gate (a batch whose bigrams
  * the accumulated history finds surprising is out-of-distribution:
  * crawler drift, injected spam, an upstream encoding break) that needs no
  * curated target corpus, only the stream itself.
  *
  * Two bucket-count models persist as per-batch DELTA rows keyed
  * `(b, batch_id)` in two [[KeyedStore]]s (context buckets and bigram
  * buckets — both ≤ `buckets` wide regardless of vocabulary growth):
  *   - replay safety, horizon reads (`batch_id < N`), the screening
  *     high-water mark, and the maintenance fold are IDENTICAL to
  *     [[IncrementalDsir]] — same row shape, so [[IncrementalDsir.readModel]]
  *     and [[IncrementalDsir.foldModel]] operate on these stores verbatim;
  *   - the score is `ext/TextStats.hashedLmSurprise`'s exact fixed-point
  *     arithmetic-mean inverse probability, so a batch's verdict equals the
  *     BATCH operator run against the union of its prior batches
  *     (spec-pinned parity), bit-stable under replay.
  *
  * Verdict rule: keep ⇔ surprise ≤ n_bi·scale·(num/den), with the
  * cold-start exception — an EMPTY history model keeps everything (there
  * is no distribution to have drifted from yet). Docs with < 2 tokens
  * carry the degenerate verdict (n_bi = 0, surprise = 0, keep = true).
  *
  * Per-batch cost: one bigram pass over the batch (map-side combined to
  * ≤ 2·buckets delta rows), two model-sized store reads, two bucketed
  * upserts, broadcast score joins — the accumulated history NEVER rescans.
  */
object IncrementalLm {

  /** (doc_id, b1, b2) bigram rows with multiplicity — the same bucketing
    * expression as `TextStats.hashedLmSurprise` (md5 slice mod buckets of
    * the left context and of the joined bigram). */
  private def bigramRows(df: DataFrame, idCol: Column, textCol: Column,
      buckets: Int): DataFrame = {
    def bucketOf(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets
    df.select(idCol.as("doc_id"), graft.ext.TextStats.toks(textCol).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(__t) - 2), " +
          "i -> struct(__t[i] AS u, concat(__t[i], ' ', __t[i+1]) AS bg))")).as("p"))
      .select(col("doc_id"), bucketOf(col("p.u")).as("b1"),
        bucketOf(col("p.bg")).as("b2"))
  }

  /** Where a restarted pipeline resumes — the bigram store carries the
    * screening high-water mark (both stores advance in lockstep). */
  def nextBatchId(spark: SparkSession, bigStorePath: String): Long =
    IncrementalDsir.nextBatchId(spark, bigStorePath)

  /** Append one batch's context/bigram bucket-count deltas to the two
    * model stores (creating them on first use). Same idempotent-replay
    * contract as [[IncrementalDsir.updateModel]]. */
  def updateModels(batch: DataFrame, ctxStorePath: String,
      bigStorePath: String, idCol: Column, textCol: Column, buckets: Int,
      batchId: Long, numBuckets: Int = 4): Unit = {
    // one bigram pass feeds BOTH deltas: explode each row into its two
    // (kind, bucket) keys, count once, split the ≤ 2·buckets-row result
    // (checkpointed — re-deriving `rows` per store would tokenize the
    // batch twice every fold)
    val counts = bigramRows(batch, idCol, textCol, buckets)
      .select(explode(array(
        struct(lit("c").as("k"), col("b1").as("b")),
        struct(lit("g").as("k"), col("b2").as("b")))).as("e"))
      .groupBy(col("e.k").as("k"), col("e.b").as("b"))
      // LAZY pin: the first push's merge materializes it; the second
      // reads the cached blocks — still one tokenize for both stores
      .agg(count(lit(1)).as("ct"))
      .localCheckpoint(false)
    def push(kind: String, path: String): Unit = {
      val delta = counts.filter(col("k") === kind)
        .select(col("b"), col("ct"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("ver", lit(0L))
        .withColumn("op_type", lit("put"))
      if (!delta.isEmpty)
        KeyedStore.merge(delta, path, keys = Seq("b", "batch_id"),
          seqCols = Seq("ver"), numBuckets = numBuckets,
          bucketCols = Seq("b"))
    }
    push("c", ctxStorePath)
    push("g", bigStorePath)
    graft.util.Blocks.freeCheckpoint(counts)
  }

  /** Screen one micro-batch against the models accumulated from batches
    * `< batchId`, then absorb the batch into both models and advance the
    * marks. Returns the batch rows + (n_bi, oov_ct, surprise, keep),
    * pinned before the stores change. */
  def screenBatch(batch: DataFrame, ctxStorePath: String,
      bigStorePath: String, idCol: Column, textCol: Column,
      buckets: Int = 4096, batchId: Long, scale: Long = 1000000L,
      num: Long = 2048L, den: Long = 1L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(scale >= 1L && num >= 1L && den >= 1L,
      s"dials must be positive: scale=$scale num=$num den=$den")
    val spark = batch.sparkSession
    val ctx = IncrementalDsir.readModel(spark, ctxStorePath, upTo = batchId)
      .withColumnRenamed("b", "b1").withColumnRenamed("ct", "c1")
    val big = IncrementalDsir.readModel(spark, bigStorePath, upTo = batchId)
      .withColumnRenamed("b", "b2").withColumnRenamed("ct", "c2")
    // cold-start flag: an empty HISTORY model keeps everything
    val empt = big.agg(coalesce(sum(col("c2")), lit(0L)).as("__mt"))
    val scored = bigramRows(batch, idCol, textCol, buckets)
      .join(broadcast(big), Seq("b2"), "left_outer")
      .join(broadcast(ctx), Seq("b1"), "left_outer")
      .select(col("doc_id"), col("c2").isNull.as("__oov"),
        ((coalesce(col("c1"), lit(0L)) + buckets) * scale).as("__sn"),
        (coalesce(col("c2"), lit(0L)) + 1).as("__sd"))
      .withColumn("__term", expr("__sn div __sd"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bi"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("oov_ct"),
        sum(col("__term").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("surprise"))
      .crossJoin(broadcast(empt))
      .withColumn("keep",
        col("__mt") === 0L ||
          col("surprise") * den <=
            col("n_bi").cast("decimal(38,0)") * scale * num)
      .select(col("doc_id").as("__sid"), col("n_bi"), col("oov_ct"),
        col("surprise"), col("keep"))
    val out = batch.join(scored, idCol === col("__sid"), "left_outer")
      .drop("__sid")
      .withColumn("n_bi", coalesce(col("n_bi"), lit(0L)))
      .withColumn("oov_ct", coalesce(col("oov_ct"), lit(0L)))
      .withColumn("surprise",
        coalesce(col("surprise"), lit(0L).cast("decimal(38,0)")))
      .withColumn("keep", coalesce(col("keep"), lit(true)))
      .localCheckpoint(true)
    updateModels(batch, ctxStorePath, bigStorePath, idCol, textCol,
      buckets, batchId)
    IncrementalDsir.advanceHwm(spark, bigStorePath, batchId + 1)
    IncrementalDsir.advanceHwm(spark, ctxStorePath, batchId + 1)
    out
  }
}

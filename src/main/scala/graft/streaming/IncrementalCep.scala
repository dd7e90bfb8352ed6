package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-batch CEP — the [[graft.ops.Cep]] automaton with its per-key
  * (stage, count, start) state in a persistent [[KeyedStore]] instead of
  * `flatMapGroupsWithState` memory: the form a resumable pipeline drives
  * batch-by-batch over real storage, the way [[IncrementalScd2]] /
  * [[IncrementalCc]] / [[IncrementalTriangles]] carry their state. The
  * quantified automaton is the general surface ([[graft.ops.Cep.Unbounded]]
  * loops included); plain `followedBy` patterns are the all-(t,1,1) case,
  * and [[foldBatchWhere]] takes Flink-`where()` PREDICATE stages over
  * declared payload fields — the full batch-operator surface, store-backed.
  *
  * The fold's step function IS the batch operator's
  * ([[graft.ops.Cep.timesFoldStep]] — shared SQL, not a twin): each fold
  * seeds the aggregate from the stored per-key state instead of zero, so
  * the concatenation of per-batch folds equals the batch operator over the
  * whole history wherever the batch boundaries fall — under the same
  * per-key event-time-order contract as [[CepStream]] (events non-
  * decreasing across batches; within a batch any order, the fold sorts).
  *
  * Store layout: one row per key ever seen — (kind 'v', k, st, c, t0) —
  * plus a high-water-mark meta row (kind 'm'), all bucketed by k. A fold
  * reads BUCKET-PRUNED by the batch's keys (+ the meta bucket): cost is
  * O(batch + touched buckets) however many keys the stream has
  * accumulated. Everything commits in ONE merge (state rows + meta), so
  * the store is never half-advanced; a replayed batch (batchId <= mark)
  * returns no matches and touches nothing — re-emission dedup is the
  * caller's sink contract, as with every counting-sketch fold here.
  *
  * Scale shape per fold: one pushable type-IN scan of the batch, one key
  * shuffle, a row-local seeded fold, one bucketed upsert of batch-key
  * state rows. Nothing ever reads or rewrites the full key population. */
object IncrementalCep {

  /** Meta sentinel key (kind disambiguates — shares only a bucket). */
  private val MetaKey = Long.MinValue

  /** Fold one batch of events (k, tms, oid, ty) into the automaton state
    * at `storePath` (created on first use) and return THIS batch's
    * completed matches (k, start_tms, end_tms) — matches whose run began
    * in earlier batches included, start stamped where stage 0 opened. */
  def foldBatch(events: DataFrame, storePath: String,
      pattern: Seq[(String, Int, Int)], withinMs: Long, batchId: Long,
      numBuckets: Int = 4): DataFrame = {
    graft.ops.Cep.validateTimes(pattern, withinMs)
    foldImpl(
      events.filter(col("ty").isin(pattern.map(_._1).distinct: _*)),
      storePath,
      pattern.map { case (t, mn, mx) =>
        (s"e.ty = ${graft.ops.Cep.esc(t)}", mn, mx) },
      withinMs, batchId, numBuckets,
      payload = Seq("ty" -> col("ty").cast("string")))
  }

  /** [[foldBatch]] with PREDICATE stages ([[graft.ops.Cep
    * .patternMatchesWhere]]'s contract): stages are SQL booleans over the
    * event struct `e` carrying `tms`, `oid`, and the declared payload
    * fields. No type pre-filter is applied — pre-filter the batch to the
    * union of the stage predicates at the call site (semantics-
    * preserving under relaxed contiguity). */
  def foldBatchWhere(events: DataFrame, storePath: String,
      stages: Seq[(String, Int, Int)], withinMs: Long, batchId: Long,
      payload: Seq[(String, org.apache.spark.sql.Column)],
      numBuckets: Int = 4): DataFrame = {
    graft.ops.Cep.validateTimes(stages, withinMs)
    require(!payload.exists(p =>
        p._1 == "k" || p._1 == "tms" || p._1 == "oid"),
      "payload field names k/tms/oid are reserved")
    foldImpl(events, storePath, stages, withinMs, batchId, numBuckets,
      payload)
  }

  /** State EXPIRY — the Flink state-TTL analog for the CEP store, closing
    * its one unbounded-growth axis (one row per key EVER seen). Two row
    * classes are provably dead under the per-key event-time-order
    * contract and a `watermarkMs` no future event's tms can precede:
    *
    *   - IDLE rows (c = 0): state (0, 0, 0) is byte-identical to "row
    *     absent" — a returning key re-opens through the same branch;
    *   - TIMED-OUT partials (c > 0, watermarkMs − t0 >= within): any
    *     future event e has `e.tms − t0 >= within`, so the fold's first
    *     branch abandons the partial and treats e exactly as the idle
    *     open does — again indistinguishable from "row absent".
    *
    * Both are PHYSICALLY PRUNED through [[KeyedStore.compact]]'s
    * `keepWhere` rewrite — justified exactly by the argument above
    * (dropped ≡ absent), and deliberately NOT a tombstone merge: a
    * tombstone would need a `ver` above every stored row yet below every
    * future fold's batchId, which no generation-derived number can
    * guarantee against caller-chosen (e.g. epoch-based) batchId spaces —
    * a tie or inversion there would nondeterministically shadow a
    * re-opened key. Cost: one full store read + rewrite (this is the
    * O(keys) maintenance pass — run it on a cadence, not per fold).
    * Returns the number of rows expired. */
  def expire(spark: SparkSession, storePath: String, watermarkMs: Long,
      withinMs: Long): Long = {
    val live = KeyedStore.readActive(spark, storePath) match {
      case None => return 0L
      case Some(s) => s
    }
    val deadCond = col("kind") === "v" &&
      (col("c") === 0 ||
        (col("c") > 0 && lit(watermarkMs) - col("t0") >= withinMs))
    val n = live.filter(deadCond).count()
    if (n > 0)
      KeyedStore.compact(spark, storePath, keepWhere = Some(!deadCond))
    n
  }

  private def foldImpl(events: DataFrame, storePath: String,
      predStages: Seq[(String, Int, Int)], withinMs: Long, batchId: Long,
      numBuckets: Int, payload: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val batch = events
      .select(Seq(col("k").cast("long").as("k"),
        col("tms").cast("long").as("tms"),
        col("oid").cast("long").as("oid")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
      .localCheckpoint(true)
    val keys = batch.select(col("k")).distinct()
    val stored = KeyedStore.readPruned(spark, storePath,
      keys.unionByName(Seq(MetaKey).toDF("k")))
    val hwm = stored.flatMap(_.filter(col("kind") === "m")
      .select(col("ver")).collect().headOption.map(_.getLong(0)))
    if (hwm.exists(batchId <= _)) {
      graft.util.Blocks.freeCheckpoint(batch)
      return Seq.empty[(Long, Long, Long)].toDF("k", "start_tms", "end_tms")
    }
    val state = stored
      .map(_.filter(col("kind") === "v")
        .join(keys, Seq("k"), "left_semi")
        .select(col("k"), col("st").cast("int").as("__st"),
          col("c").cast("int").as("__c"), col("t0").cast("long").as("__t0")))
      .getOrElse(spark.range(0).select(col("id").as("k"),
        lit(0).as("__st"), lit(0).as("__c"), lit(0L).as("__t0")))
    // the SAME step function as the batch operator, seeded from storage
    val fold = s"""aggregate(evs,
      named_struct('st', coalesce(__st, 0), 'c', coalesce(__c, 0),
        't0', coalesce(__t0, CAST(0 AS BIGINT)),
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${graft.ops.Cep.timesFoldStepPred(predStages, withinMs)},
      acc -> acc)"""
    val fields = Seq(col("tms"), col("oid")) ++ payload.map(p => col(p._1))
    val folded = batch.groupBy("k")
      .agg(sort_array(collect_list(struct(fields: _*))).as("evs"))
      .join(state, Seq("k"), "left_outer")
      .select(col("k"), expr(fold).as("r"))
      .localCheckpoint(true) // pin BEFORE the merge GCs the read generation
    val stateRows = folded.select(lit("v").as("kind"), col("k"),
      col("r.st").as("st"), col("r.c").as("c"), col("r.t0").as("t0"),
      lit(batchId).as("ver"), lit("put").as("op_type"))
    val metaRow = spark.range(1).select(lit("m").as("kind"),
      lit(MetaKey).as("k"), lit(-1).as("st"), lit(-1).as("c"),
      lit(0L).as("t0"), lit(batchId).as("ver"), lit("put").as("op_type"))
    // ONE commit point: state rows and the high-water mark land together
    KeyedStore.merge(stateRows.unionByName(metaRow), storePath,
      keys = Seq("kind", "k"), seqCols = Seq("ver"),
      numBuckets = numBuckets, bucketCols = Seq("k"))
    val out = folded.select(col("k"), explode(col("r.ms")).as("m"))
      .select(col("k"), col("m.s").as("start_tms"), col("m.e").as("end_tms"))
      .localCheckpoint(true)
    graft.util.Blocks.freeCheckpoint(folded)
    graft.util.Blocks.freeCheckpoint(batch)
    out
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Project, Stateful}

/** Verify queries for keyed-state / changelog-sink semantics
  * (SURVEY.md §2.2 K3/K4, §2.5 T5). */
object StateQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** Shared typed Maxwell projection for K3/K4 (the Scala twin of the MXV
    * oracle CTE below — keep them in lockstep). */
  private def mxv(s: SparkSession, dir: String): DataFrame =
    Project.etlFilter(Envelopes.maxwell(s, dir))
      .select(element_at(col("data"), "order_id").cast("long").as("order_id"),
        element_at(col("data"), "id").cast("long").as("id"),
        col("type").as("typ"),
        element_at(col("data"), "sku_num").as("sku_num"),
        col("ts"))

  /** Version order for K3/K4. (ts, id) is NOT unique in the synthetic data
    * (duplicate (l_orderkey, l_linenumber) pairs exist) — the payload columns
    * extend it to a total order so the winning VALUE is deterministic. */
  private val versionOrder = Seq(col("ts"), col("id"), col("sku_num"), col("typ"))

  /** Maxwell projection carrying BOTH SCD2-tracked attributes. */
  private def mxv2(s: SparkSession, dir: String): DataFrame =
    Project.etlFilter(Envelopes.maxwell(s, dir))
      .select(element_at(col("data"), "order_id").cast("long").as("order_id"),
        element_at(col("data"), "id").cast("long").as("id"),
        col("type").as("typ"),
        element_at(col("data"), "sku_num").as("sku_num"),
        element_at(col("data"), "payment_status").as("pay_st"),
        col("ts"))

  /** SCD2 version order: [[versionOrder]] extended with pay_st so rows
    * differing ONLY in the second tracked attribute still totally order. */
  private val scd2Order =
    Seq(col("ts"), col("id"), col("sku_num"), col("pay_st"), col("typ"))

  val queries: Map[String, QFn] = Map(
    // K3 — upsert (keyed compaction): last version per order_id wins.
    "q_upsert_dedup" -> { (s, dir) =>
      Stateful.lastWriteWins(mxv(s, dir), Seq(col("order_id")), versionOrder)
        .select(col("order_id"), col("id").as("last_id"), col("typ").as("last_typ"),
          col("sku_num").as("last_sku_num"))
        .orderBy(col("order_id"))
    },

    // K4 — keyed put/delete merge: final dim state after applying ops in order.
    "q_dim_merge" -> { (s, dir) =>
      Stateful.mergeFinalState(mxv(s, dir), Seq(col("order_id")),
          versionOrder, col("typ"))
        .select(col("order_id"), col("sku_num").as("last_sku_num"))
        .orderBy(col("order_id"))
    },

    // SCD2 — every version of (sku_num, pay_st) per order with validity
    // intervals: no-op updates absorbed, deletes open gaps, re-inserts
    // re-version. The dimension-history complement of q_dim_merge.
    "q_scd2" -> { (s, dir) =>
      Stateful.scd2History(mxv2(s, dir), Seq(col("order_id")), scd2Order,
          col("ts"), Seq(col("sku_num"), col("pay_st")),
          Seq("sku_num", "pay_st"), col("typ"))
        .withColumn("ver", col("ver").cast("long"))
        .orderBy(col("order_id"), col("ver"))
    },

    // SCD2 point-in-time fact enrichment: lineitem probes (staggered 3
    // days per line past ship) pick the version valid at their event time;
    // probes inside delete gaps or before the first version keep nulls.
    "q_scd2_join" -> { (s, dir) =>
      val hist = Stateful.scd2History(mxv2(s, dir), Seq(col("order_id")),
        scd2Order, col("ts"), Seq(col("sku_num"), col("pay_st")),
        Seq("sku_num", "pay_st"), col("typ"))
      val facts = Envelopes.table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 7 === 3)
        .select(col("l_orderkey").as("order_id"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("fact_id"),
          (expr("unix_millis(cast(l_shipdate as timestamp)) div 1000") +
            col("l_linenumber") * 259200L).as("fts"))
      Stateful.scd2Lookup(facts, hist, Seq("order_id"), col("fts"))
        .select(col("order_id"), col("fact_id"), col("fts"),
          col("sku_num"), col("pay_st"), col("ver").cast("long").as("ver"))
        .orderBy(col("order_id"), col("fact_id"), col("fts"))
    },

    // Cross-batch SCD2: the changelog split into three ts-range batches
    // (leading order column, so per-key cross-batch order holds — the CDC
    // offset contract), folded through the persistent store; the final
    // history is provably the batch operator's, so the oracle IS q_scd2's
    // SQL verbatim.
    "q_scd2_stream" -> { (s, dir) =>
      // pin the decoded changelog ONCE: each fold fires two actions (key
      // probe + changed-rows pin) and the lazy Maxwell JSON decode would
      // re-run per action — a real stream's batches arrive already decoded
      val src = mxv2(s, dir).localCheckpoint(true)
      val root = java.nio.file.Files.createTempDirectory("graft_scd2_q")
      val cuts = Seq(757382400L, 820454400L) // 1994-01-01, 1996-01-01 UTC
      val parts = Seq(src.filter(col("ts") < cuts(0)),
        src.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
        src.filter(col("ts") >= cuts(1)))
      var out: DataFrame = null
      for ((b, i) <- parts.zipWithIndex)
        out = graft.streaming.IncrementalScd2.mergeBatch(b, s"$root/h",
          keys = Seq("order_id"),
          ordCols = Seq("ts", "id", "sku_num", "pay_st", "typ"),
          attrNames = Seq("sku_num", "pay_st"), batchId = i.toLong,
          // bucket count = the store's write/read parallelism unit: this
          // history holds ~130k keys spread over every bucket, so each fold
          // rewrites all buckets and the default 4 capped the merge sort at
          // 4 of the session's cores. Scale with the session but CAP it
          // (ADVICE r15): unbounded defaultParallelism fragments a ~130k-key
          // temp store into one tiny file per bucket per generation on a
          // high-core session, inflating commit/GC metadata work. The value
          // only takes effect at store creation (KeyedStore meta pins it);
          // a reused store keeps the count it was created with.
          numBuckets = math.min(s.sparkContext.defaultParallelism, 64))
      // the fold returns a lazy store read — pin it before the temp store
      // is deleted (the q_topk_stream lifecycle)
      val res = out
        .withColumn("ver", col("ver").cast("long"))
        .select(col("order_id"), col("sku_num"), col("pay_st"),
          col("effective_from"), col("effective_to"), col("is_current"),
          col("ver"))
        .orderBy(col("order_id"), col("ver"))
        .localCheckpoint(true)
      graft.util.Blocks.freeCheckpoint(src)
      graft.util.Tmp.deleteRecursively(root)
      res
    },

    // T5 — new-visitor repair (batch oracle of the keyed-state rules).
    "q_isnew_fix" -> { (s, dir) =>
      val lg = Project.logEtl(Envelopes.logRecords(s, dir))
        .select(col("event_id"), col("common.mid").as("mid"),
          col("common.is_new").as("is_new"), col("ts"),
          date_format(timestamp_millis(col("ts")), "yyyy-MM-dd").as("dt"))
      Stateful.isNewFixBatch(lg, col("mid"), col("dt"), col("is_new"),
          Seq(col("ts"), col("event_id")))
        .select(col("event_id"), col("mid"), col("is_new"), col("dt"), col("is_new_fixed"))
        .orderBy(col("event_id"))
    })

  import Envelopes.{maxwellCte => MX, logCte => LG}

  /** Shared flattened+typed Maxwell projection for the K3/K4 oracles. */
  private val MXV: String =
    s"""$MX,
       |mxv AS (
       |  SELECT CAST(order_id AS BIGINT) AS order_id, CAST(id AS BIGINT) AS id,
       |         typ, sku_num, ts
       |  FROM mx
       |  WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete'))""".stripMargin

  /** Shared SCD2 history chain (the twin of `Stateful.scd2History` over
    * [[mxv2]]): boundary detection by lagged null-safe attribute compare,
    * interval close by lead over the kept (boundary ∪ delete) rows, version
    * numbers over the surviving boundaries — window for window the Scala
    * plan. */
  private val SCD2: String =
    s"""$MX,
       |mxv2 AS (
       |  SELECT CAST(order_id AS BIGINT) AS order_id, CAST(id AS BIGINT) AS id,
       |         typ, sku_num, payment_status AS pay_st, ts
       |  FROM mx
       |  WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete')),
       |scd_m AS (
       |  SELECT *,
       |         lag(typ) OVER w AS p_typ,
       |         lag(sku_num) OVER w AS p_sku,
       |         lag(pay_st) OVER w AS p_pay
       |  FROM mxv2
       |  WINDOW w AS (PARTITION BY order_id ORDER BY ts, id, sku_num, pay_st, typ)),
       |scd_k AS (
       |  SELECT * FROM (
       |    SELECT *,
       |           CASE WHEN typ = 'delete' THEN FALSE
       |                ELSE p_typ IS NULL OR p_typ = 'delete'
       |                  OR sku_num IS DISTINCT FROM p_sku
       |                  OR pay_st IS DISTINCT FROM p_pay END AS opens
       |    FROM scd_m)
       |  WHERE opens OR typ = 'delete'),
       |scd_f AS (
       |  SELECT *, lead(ts) OVER (PARTITION BY order_id
       |    ORDER BY ts, id, sku_num, pay_st, typ) AS eff_to
       |  FROM scd_k),
       |scd2 AS (
       |  SELECT order_id, sku_num, pay_st, ts AS effective_from,
       |         eff_to AS effective_to, eff_to IS NULL AS is_current,
       |         CAST(row_number() OVER (PARTITION BY order_id
       |           ORDER BY ts, id, sku_num, pay_st, typ) AS BIGINT) AS ver
       |  FROM scd_f WHERE opens)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_upsert_dedup" ->
      s"""WITH $MXV
         |SELECT order_id, id AS last_id, typ AS last_typ, sku_num AS last_sku_num
         |FROM mxv
         |QUALIFY row_number() OVER (PARTITION BY order_id ORDER BY ts DESC, id DESC, sku_num DESC, typ DESC) = 1
         |ORDER BY order_id""".stripMargin,

    "q_dim_merge" ->
      s"""WITH $MXV
         |SELECT order_id, sku_num AS last_sku_num FROM (
         |  SELECT order_id, typ, sku_num FROM mxv
         |  QUALIFY row_number() OVER (PARTITION BY order_id ORDER BY ts DESC, id DESC, sku_num DESC, typ DESC) = 1)
         |WHERE typ <> 'delete'
         |ORDER BY order_id""".stripMargin,

    "q_scd2" ->
      s"""WITH $SCD2
         |SELECT order_id, sku_num, pay_st, effective_from, effective_to,
         |       is_current, ver
         |FROM scd2 ORDER BY order_id, ver""".stripMargin,

    // the fold is lossless over the concatenated changelog, so the
    // streaming drive's truth is the batch history itself
    "q_scd2_stream" ->
      s"""WITH $SCD2
         |SELECT order_id, sku_num, pay_st, effective_from, effective_to,
         |       is_current, ver
         |FROM scd2 ORDER BY order_id, ver""".stripMargin,

    "q_scd2_join" ->
      s"""WITH $SCD2,
         |facts AS (
         |  SELECT l_orderkey AS order_id,
         |         l_orderkey * 10 + l_linenumber AS fact_id,
         |         epoch_ms(l_shipdate) // 1000 + l_linenumber * 259200 AS fts
         |  FROM lineitem WHERE l_orderkey % 7 = 3)
         |SELECT f.order_id, f.fact_id, f.fts, h.sku_num, h.pay_st, h.ver
         |FROM facts f LEFT JOIN scd2 h
         |  ON h.order_id = f.order_id AND h.effective_from <= f.fts
         | AND (h.effective_to IS NULL OR f.fts < h.effective_to)
         |ORDER BY f.order_id, f.fact_id, f.fts""".stripMargin,

    "q_isnew_fix" ->
      s"""WITH $LG,
         |v AS (
         |  SELECT event_id, mid, is_new, ts,
         |         strftime(make_timestamp(ts * 1000), '%Y-%m-%d') AS dt
         |  FROM lg
         |  WHERE (has_page OR has_start) AND mid IS NOT NULL),
         |m AS (SELECT *,
         |        first_value(is_new) OVER (PARTITION BY mid ORDER BY ts, event_id) AS f_new,
         |        first_value(dt) OVER (PARTITION BY mid ORDER BY ts, event_id) AS f_dt
         |      FROM v)
         |SELECT event_id, mid, is_new, dt,
         |       CASE WHEN is_new = '1' AND dt = (CASE WHEN f_new = '1' THEN f_dt
         |              ELSE strftime(CAST(f_dt AS DATE) - 1, '%Y-%m-%d') END)
         |            THEN '1' ELSE '0' END AS is_new_fixed
         |FROM m ORDER BY event_id""".stripMargin)
}

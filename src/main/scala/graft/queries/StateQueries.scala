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

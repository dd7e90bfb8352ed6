package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.Project

/** Verify queries for the projection/filter/scalar family (SURVEY.md §2.3) plus
  * the flagship aggregation. Each entry has a DuckDB oracle with IDENTICAL
  * output column names and an identical deterministic ORDER BY.
  */
object CoreQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // Flagship: TPC-H Q1-shaped aggregation (decimal-exact sums).
    "q1_agg" -> { (s, dir) =>
      Envelopes.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Envelopes.moneySum(col("l_quantity")).as("sum_qty"),
          Envelopes.moneySum(col("l_extendedprice")).as("sum_base_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // S3 — Maxwell envelope source + event-time derivation.
    "q_source_envelope" -> { (s, dir) =>
      Envelopes.maxwell(s, dir).select(
        col("database").as("db"), col("table").as("tbl"), col("type").as("typ"),
        element_at(col("data"), "id").as("id"),
        col("ts"),
        date_format(timestamp_seconds(col("ts")), "yyyy-MM-dd HH:mm:ss").as("row_time"))
        .orderBy(col("ts"), coalesce(col("id"), lit("")), col("db"))
    },

    // P1 — Maxwell ETL filter.
    "q_etl_filter" -> { (s, dir) =>
      Project.etlFilter(Envelopes.maxwell(s, dir))
        .select(element_at(col("data"), "id").as("id"), col("type").as("typ"), col("ts"))
        .orderBy(col("id").cast("long"), col("ts"))
    },

    // P2 — log ETL filter.
    "q_log_etl" -> { (s, dir) =>
      Project.logEtl(Envelopes.logRecords(s, dir))
        .select(col("event_id"), col("common.mid").as("mid"),
          col("common.is_new").as("is_new"), col("page.page_id").as("page_id"), col("ts"))
        .orderBy(col("event_id"))
    },

    // P2 side branch — the dirty rows the reference counts/prints
    // (`DwdBaseLog.java:229`), with the rejection reason.
    "q_log_etl_dirty" -> { (s, dir) =>
      Project.logEtlDirty(Envelopes.logRecords(s, dir))
        .select(col("event_id"),
          when(col("common.mid").isNull, "no_mid")
            .when(col("page").isNull && col("start").isNull, "no_page_start")
            .otherwise("other").as("reason"))
        .orderBy(col("event_id"))
    },

    // P3 — map-element projection over routed cart rows.
    "q_map_project" -> { (s, dir) =>
      val routed = Project.etlFilter(Envelopes.maxwell(s, dir))
        .filter(col("table") === "cart_info")
      Project.mapProject(routed,
        Seq("id", "order_id", "sku_id", "user_id", "sku_num", "payment_status"),
        Seq(col("ts")))
        .orderBy(col("id").cast("long"), col("sku_id"), col("user_id"), col("sku_num"),
          col("payment_status"), col("ts"))
    },

    // P4 — source-table routing predicate.
    "q_route_filter" -> { (s, dir) =>
      Project.routeFilter(Envelopes.maxwell(s, dir), "cart_info", Seq("insert"))
        .select(element_at(col("data"), "id").as("id"), col("ts"))
        .orderBy(col("id").cast("long"), col("ts"))
    },

    // P5 — CDC update-transition (payment success) predicate.
    "q_cdc_transition" -> { (s, dir) =>
      Project.cdcTransition(
        Project.routeFilter(Envelopes.maxwell(s, dir), "cart_info", Seq("update")),
        "payment_status", "1602")
        .select(element_at(col("data"), "id").as("id"),
          element_at(col("data"), "order_id").as("order_id"),
          element_at(col("data"), "payment_status").as("payment_status"),
          element_at(col("old"), "payment_status").as("old_status"),
          col("ts"))
        .orderBy(col("id").cast("long"), col("ts"))
    },

    // P6+P7 — cart-add increase-only delta (the minimum end-to-end DWD slice).
    "q_cart_add" -> { (s, dir) =>
      val routed = Project.routeFilter(Envelopes.maxwell(s, dir),
        "cart_info", Seq("insert", "update"))
      Project.cartIncreaseOnly(routed)
        .select(element_at(col("data"), "id").as("id"),
          element_at(col("data"), "user_id").as("user_id"),
          element_at(col("data"), "sku_id").as("sku_id"),
          Project.cartAddDelta.as("sku_num"),
          col("ts"))
        .orderBy(col("id").cast("long"), col("user_id"), col("sku_id"), col("sku_num"), col("ts"))
    },

    // P8 — config-driven dynamic column pruning (broadcast config join).
    "q_column_prune" -> { (s, dir) =>
      val mx  = Project.etlFilter(Envelopes.maxwell(s, dir))
      val cfg = Envelopes.configDim(s)
      val joined = mx.join(broadcast(cfg), mx("table") === cfg("sourceTable"), "inner")
      Project.pruneColumns(joined, col("sinkColumns"))
        .select(element_at(col("data"), "id").as("id"),
          array_join(array_sort(map_keys(col("data"))), ",").as("kept_cols"),
          element_at(col("data"), "sku_num").as("sku_num"))
        .orderBy(col("id").cast("long"), col("sku_num"))
    },

    // P9 + T4 — date/time scalar functions (epoch-ms ↔ formatted ↔ partition key).
    "q_date_fns" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .select(col("event_id"), expr("unix_millis(ts)").as("ts_ms"),
          date_format(col("ts"), "yyyy-MM-dd").as("dt"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("dtm"),
          date_format(col("ts"), "yyyyMMdd").as("dpart"))
        .withColumn("back_ts", unix_timestamp(col("dtm")))
        .orderBy(col("event_id"))
    },

    // P10 — string split family.
    "q_string_fns" -> { (s, dir) =>
      Envelopes.table(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_toks"),
          element_at(split(col("text"), " "), 1).as("first_tok"),
          array_join(slice(split(col("text"), " "), 1, 3), "_").as("head3"))
        .orderBy(col("doc_id"))
    },

    // P11 — JSON scalar access over raw JSON strings.
    "q_json_fns" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
        .orderBy(col("event_id"))
    },

    // Event-time SESSION windows (gap 6 h) — the dynamic-window sibling of
    // the §2.9 fixed windows: per user, events merge transitively while
    // consecutive gaps stay under the timeout; window end = last event +
    // gap (Spark session_window semantics; an event at EXACTLY prev+gap
    // opens a new session). The oracle is the classic gaps-and-islands
    // form — brk on lag-diff ≥ gap, running-sum session ids — exact to the
    // microsecond, so the window bounds full-hash match. Streaming parity
    // (watermark + merging across micro-batches) in SessionWindowStreamSpec.
    "q_session_bounds" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"),
          Envelopes.moneySum(col("value")).as("sum_value"))
        .select(col("user_id"),
          expr("unix_micros(session_window.start)").as("sess_start"),
          expr("unix_micros(session_window.end)").as("sess_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("sess_start"))
    })

  import Envelopes.{maxwellCte => MX, logCte => LG}

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_source_envelope" ->
      s"""WITH $MX
         |SELECT db, tbl, typ, id, ts,
         |       strftime(make_timestamp(ts * 1000000), '%Y-%m-%d %H:%M:%S') AS row_time
         |FROM mx ORDER BY ts, COALESCE(id, ''), db""".stripMargin,

    "q_etl_filter" ->
      s"""WITH $MX
         |SELECT id, typ, ts FROM mx
         |WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete')
         |ORDER BY CAST(id AS BIGINT), ts""".stripMargin,

    "q_log_etl" ->
      s"""WITH $LG
         |SELECT event_id, mid, is_new, page_id, ts FROM lg
         |WHERE (has_page OR has_start) AND mid IS NOT NULL
         |ORDER BY event_id""".stripMargin,

    "q_log_etl_dirty" ->
      s"""WITH $LG
         |SELECT event_id,
         |       CASE WHEN mid IS NULL THEN 'no_mid'
         |            WHEN NOT (has_page OR has_start) THEN 'no_page_start'
         |            ELSE 'other' END AS reason
         |FROM lg
         |WHERE NOT ((has_page OR has_start) AND mid IS NOT NULL)
         |ORDER BY event_id""".stripMargin,

    "q_map_project" ->
      s"""WITH $MX
         |SELECT id, order_id, sku_id, user_id, sku_num, payment_status, ts FROM mx
         |WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete')
         |  AND tbl = 'cart_info'
         |ORDER BY CAST(id AS BIGINT), sku_id, user_id, sku_num, payment_status, ts""".stripMargin,

    "q_route_filter" ->
      s"""WITH $MX
         |SELECT id, ts FROM mx
         |WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'insert'
         |ORDER BY CAST(id AS BIGINT), ts""".stripMargin,

    "q_cdc_transition" ->
      s"""WITH $MX
         |SELECT id, order_id, payment_status, old_status, ts FROM (
         |  SELECT id, order_id, payment_status, old_payment_status AS old_status, ts FROM mx
         |  WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'update'
         |    AND old_payment_status IS NOT NULL AND payment_status = '1602')
         |ORDER BY CAST(id AS BIGINT), ts""".stripMargin,

    "q_cart_add" ->
      s"""WITH $MX
         |SELECT id, user_id, sku_id,
         |       CASE WHEN typ = 'insert' THEN sku_num
         |            ELSE CAST(CAST(sku_num AS BIGINT) - CAST(old_sku_num AS BIGINT) AS VARCHAR) END AS sku_num,
         |       ts
         |FROM mx
         |WHERE db = 'gmall' AND tbl = 'cart_info'
         |  AND (typ = 'insert' OR (typ = 'update' AND old_sku_num IS NOT NULL
         |       AND CAST(sku_num AS BIGINT) > CAST(old_sku_num AS BIGINT)))
         |ORDER BY CAST(id AS BIGINT), user_id, sku_id, sku_num, ts""".stripMargin,

    "q_column_prune" ->
      s"""WITH $MX
         |SELECT id, 'id,sku_id,sku_num' AS kept_cols, sku_num FROM mx
         |WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete')
         |  AND tbl = 'cart_info'
         |ORDER BY CAST(id AS BIGINT), sku_num""".stripMargin,

    "q_date_fns" ->
      """SELECT event_id, epoch_ms(ts) AS ts_ms,
        |       strftime(ts, '%Y-%m-%d') AS dt,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS dtm,
        |       strftime(ts, '%Y%m%d') AS dpart,
        |       epoch_ms(date_trunc('second', ts)) // 1000 AS back_ts
        |FROM events ORDER BY event_id""".stripMargin,

    "q_string_fns" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
        |       string_split(text, ' ')[1] AS first_tok,
        |       array_to_string(string_split(text, ' ')[1:3], '_') AS head3
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_json_fns" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin,

    "q_session_bounds" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 21600000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |  FROM g)
        |SELECT user_id,
        |       MIN(epoch_us(ts)) AS sess_start,
        |       MAX(epoch_us(ts)) + 21600000000 AS sess_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin)
}

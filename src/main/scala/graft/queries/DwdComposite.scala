package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Joins, Project, Split, Stateful}

/** The reference's flagship DWD app as ONE composite query
  * (`DwdTradeOrderDetail.java:24-120`): order_detail ⋈ order_info inner join,
  * double left join to activity/coupon, final per-PK state via upsert
  * compaction (PK = detail id, `DwdTradeOrderDetail.java:86`) — the end-to-end
  * path a user of the reference actually runs. */
object DwdComposite {
  type QFn = (SparkSession, String) => DataFrame

  // lazy: the sibling maps are defined below (single registration point for
  // the whole composite family — SparkEntry wires only queries/oracles)
  lazy val queries: Map[String, QFn] = commentQueries ++ paySucQueries ++
    baseLogQueries ++ Map(
    "q_dwd_order_detail" -> { (s, dir) =>
      val od  = Envelopes.orderDetail(s, dir)
      val oi  = Envelopes.orderInfo(s, dir)
      val oda = Envelopes.orderDetailActivity(s, dir)
      val odc = Envelopes.orderDetailCoupon(s, dir)
      val joined = Joins.leftOuter(
          Joins.leftOuter(
            Joins.inner(od, oi, od("order_id") === oi("id")),
            oda, od("id") === oda("id")),
          odc, od("id") === odc("id"))
        .select(od("id"), od("order_id"), oi("user_id"), oi("province_id"),
          od("sku_id"), od("sku_num"), od("split_total_amount"),
          coalesce(oda("activity_id"), lit(-1L)).as("activity_id"),
          coalesce(odc("coupon_id"), lit(-1L)).as("coupon_id"),
          od("ts"))
      // upsert-Kafka PK semantics: last version per detail id wins; the
      // version order is extended to a total order (duplicate ids exist in
      // the synthetic lineitem).
      Stateful.lastWriteWins(joined, Seq(col("id")),
          Seq(col("ts"), col("sku_num"), col("sku_id"), col("split_total_amount"),
            col("activity_id"), col("coupon_id")))
        .orderBy(col("id"))
    })

  /** Second composite: the interaction-comment app
    * (`DwdInteractionCommentInfo.java:22-103`) — route → map-project → lookup
    * join against the dim snapshot, end-to-end. */
  private val commentQueries: Map[String, QFn] = Map(
    "q_dwd_comment" -> { (s, dir) =>
      val routed = graft.ops.Project.routeFilter(
        Envelopes.maxwell(s, dir), "cart_info", Seq("insert"))
      val c = graft.ops.Project.mapProject(routed, Seq("id", "user_id", "sku_id"),
          Seq(col("ts")))
        .withColumn("appraise",
          (col("sku_id").cast("long") % 25).cast("string"))
      val dim = Envelopes.dimBaseDic(s, dir)
      Joins.lookup(c, dim, col("appraise") === col("rowkey"))
        .select(col("id"), col("user_id"), col("sku_id"), col("appraise"),
          col("dic_name"), col("ts"))
        // duplicate (l_orderkey, l_linenumber) ids exist in the synthetic
        // data: user_id extends the sort to a provably total order
        .orderBy(col("id").cast("long"), col("sku_id"), col("user_id"), col("ts"))
    })

  /** Third composite: the payment-success app end-to-end
    * (`DwdTradeOrderPaySucDetail.java:22-203`) — P5 CDC update-transition
    * filter (`:192-194`) → J3 interval join on order_id with
    * `p.ts ∈ [od.ts − 15 min, od.ts + 5 s]` (`:119-144`, range `:141`) →
    * J5 lookup-LEFT against the dim snapshot on payment_type (`:90-113`,
    * unknown codes keep the row with a null name) → upsert compaction on the
    * detail PK (`:60-84`). Scale shape: the CDC filter prunes the payment
    * side before the keyed shuffle, the interval join stays an equi-join on
    * order_id with the range as a residual, and the dim is broadcast — the
    * fact stream is shuffled exactly once. */
  private val paySucQueries: Map[String, QFn] = Map(
    "q_dwd_pay_suc" -> { (s, dir) =>
      val pay = Project.cdcTransition(
        Project.routeFilter(Envelopes.maxwell(s, dir), "cart_info", Seq("update")),
        "payment_status", "1602")
      val p = pay.select(
        element_at(col("data"), "order_id").cast("long").as("order_id"),
        element_at(col("data"), "user_id").as("user_id"),
        // payment_type stand-in (fixture has no payment_type key); % 30
        // exceeds the dic key range so some codes resolve to NULL names,
        // exercising the LEFT of the lookup join
        (element_at(col("data"), "sku_id").cast("long") % 30).cast("string")
          .as("payment_type"),
        (col("ts") * 1000).as("p_ts"))
      val od = Envelopes.orderDetail(s, dir).select(
        col("id"), col("order_id").as("od_order_id"), col("sku_id"),
        col("sku_num"), col("split_total_amount"), (col("ts") * 1000).as("od_ts"))
      val joined = Joins.interval(p, od,
        (col("order_id"), col("od_order_id")), (col("p_ts"), col("od_ts")),
        lowerMs = 15 * 60 * 1000L, upperMs = 5000L)
      val wide = Joins.lookup(joined, Envelopes.dimBaseDic(s, dir),
          col("payment_type") === col("rowkey"), leftOuter = true)
        .select(col("id"), col("order_id"), col("user_id"),
          col("payment_type").as("payment_type_code"),
          col("dic_name").as("payment_type_name"),
          col("sku_id"), col("sku_num"), col("split_total_amount"),
          col("p_ts"), col("od_ts"))
      // upsert-Kafka PK semantics on the detail id; the version order spans
      // every non-key output column (duplicate detail ids exist in the
      // synthetic lineitem) so the surviving VALUE is a total order.
      // payment_type_name is omitted: it is determined by payment_type_code.
      Stateful.lastWriteWins(wide, Seq(col("id")),
          Seq(col("p_ts"), col("od_ts"), col("user_id"), col("payment_type_code"),
            col("sku_id"), col("sku_num"), col("split_total_amount")))
        .orderBy(col("id"))
    })

  /** Fourth composite: the base-log app end-to-end (`DwdBaseLog.handle:42-74`)
    * — P2 log ETL (`:212-233`) → T5 keyed is_new repair over ALL valid rows
    * (`:135-183`; the state must see start-only rows too) → X1 page branch
    * (`:123-129`) carrying the repaired flag. */
  private val baseLogQueries: Map[String, QFn] = Map(
    "q_dwd_base_log" -> { (s, dir) =>
      val valid = Project.logEtl(Envelopes.logRecords(s, dir))
        .withColumn("dt", date_format(timestamp_millis(col("ts")), "yyyy-MM-dd"))
      val fixed = Stateful.isNewFixBatch(valid, col("common.mid"), col("dt"),
        col("common.is_new"), Seq(col("ts"), col("event_id")))
      Split.pageBranch(fixed)
        .select(col("event_id"), col("common.mid").as("mid"), col("is_new_fixed"),
          col("page.page_id").as("page_id"),
          col("page.last_page_id").as("last_page_id"),
          col("page.item").as("item"),
          col("page.during_time").as("during_time"), col("ts"))
        .orderBy(col("event_id"))
    })

  import Envelopes.{maxwellCte => MX, logCte => LG, odCte, oiCte, odaCte, odcCte, dimCte}

  private val paySucOracles: Map[String, String] = Map(
    "q_dwd_pay_suc" ->
      s"""WITH $MX, $odCte, $dimCte,
         |pay AS (
         |  SELECT CAST(order_id AS BIGINT) AS order_id, user_id,
         |         CAST(CAST(sku_id AS BIGINT) % 30 AS VARCHAR) AS payment_type,
         |         ts * 1000 AS p_ts
         |  FROM mx
         |  WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'update'
         |    AND old_payment_status IS NOT NULL AND payment_status = '1602'),
         |wide AS (
         |  SELECT od.id, p.order_id, p.user_id, p.payment_type AS payment_type_code,
         |         dic.dic_name AS payment_type_name, od.sku_id, od.sku_num,
         |         od.split_total_amount, p.p_ts, od.ts * 1000 AS od_ts
         |  FROM pay p
         |  JOIN od ON p.order_id = od.order_id
         |   AND p.p_ts BETWEEN od.ts * 1000 - 900000 AND od.ts * 1000 + 5000
         |  LEFT JOIN dic ON p.payment_type = dic.rowkey)
         |SELECT id, order_id, user_id, payment_type_code, payment_type_name,
         |       sku_id, sku_num, split_total_amount, p_ts, od_ts
         |FROM wide
         |QUALIFY row_number() OVER (PARTITION BY id
         |  ORDER BY p_ts DESC, od_ts DESC, user_id DESC, payment_type_code DESC,
         |           sku_id DESC, sku_num DESC, split_total_amount DESC) = 1
         |ORDER BY id""".stripMargin)

  private val baseLogOracles: Map[String, String] = Map(
    "q_dwd_base_log" ->
      s"""WITH $LG,
         |v AS (
         |  SELECT event_id, mid, is_new, ts, page_id, last_page_id, item,
         |         during_time, has_page,
         |         strftime(make_timestamp(ts * 1000), '%Y-%m-%d') AS dt
         |  FROM lg
         |  WHERE (has_page OR has_start) AND mid IS NOT NULL),
         |m AS (SELECT *,
         |        first_value(is_new) OVER (PARTITION BY mid ORDER BY ts, event_id) AS f_new,
         |        first_value(dt) OVER (PARTITION BY mid ORDER BY ts, event_id) AS f_dt
         |      FROM v)
         |SELECT event_id, mid,
         |       CASE WHEN is_new = '1' AND dt = (CASE WHEN f_new = '1' THEN f_dt
         |              ELSE strftime(CAST(f_dt AS DATE) - 1, '%Y-%m-%d') END)
         |            THEN '1' ELSE '0' END AS is_new_fixed,
         |       page_id, last_page_id, item, during_time, ts
         |FROM m WHERE has_page ORDER BY event_id""".stripMargin)

  private val commentOracles: Map[String, String] = Map(
    "q_dwd_comment" ->
      s"""WITH $MX, $dimCte
         |SELECT id, user_id, sku_id, CAST(CAST(sku_id AS BIGINT) % 25 AS VARCHAR) AS appraise,
         |       dic_name, ts
         |FROM mx JOIN dic ON CAST(CAST(sku_id AS BIGINT) % 25 AS VARCHAR) = rowkey
         |WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'insert'
         |ORDER BY CAST(id AS BIGINT), sku_id, user_id, ts""".stripMargin)

  val oracles: Map[String, String] = commentOracles ++ paySucOracles ++
    baseLogOracles ++ Map(
    "q_dwd_order_detail" ->
      s"""WITH $odCte, $oiCte, $odaCte, $odcCte
         |SELECT id, order_id, user_id, province_id, sku_id, sku_num,
         |       split_total_amount, activity_id, coupon_id, ts FROM (
         |  SELECT od.id, od.order_id, oi.user_id, oi.province_id, od.sku_id,
         |         od.sku_num, od.split_total_amount,
         |         COALESCE(oda.activity_id, -1) AS activity_id,
         |         COALESCE(odc.coupon_id, -1) AS coupon_id, od.ts
         |  FROM od JOIN oi ON od.order_id = oi.id
         |          LEFT JOIN oda ON od.id = oda.id
         |          LEFT JOIN odc ON od.id = odc.id)
         |QUALIFY row_number() OVER (PARTITION BY id
         |  ORDER BY ts DESC, sku_num DESC, sku_id DESC, split_total_amount DESC,
         |           activity_id DESC, coupon_id DESC) = 1
         |ORDER BY id""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Joins, Project}

/** Verify queries for the join family (SURVEY.md §2.4, J1–J6). */
object JoinQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** Customer dim served through [[graft.streaming.DimCache]] — built once
    * per (session, corpus): wipe any previous JVM's store, one
    * KeyedStore.merge, then a cache instance whose pinned buckets all later
    * lookups in the session share (the second call is the cache-hit path —
    * exactly the steady-state of a micro-batch stream). */
  private val dimCacheMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), graft.streaming.DimCache]
  private def customerCache(s: SparkSession, dir: String): graft.streaming.DimCache =
    dimCacheMemo.computeIfAbsent((s, dir), { case (s, dir) =>
      val path = s"/tmp/graft_dimstore_${math.abs(dir.hashCode)}_customer"
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      graft.streaming.KeyedStore.merge(
        Envelopes.table(s, dir, "customer").withColumn("op_type", lit("put")),
        path, keys = Seq("c_custkey"), seqCols = Seq("c_custkey"), numBuckets = 8)
      new graft.streaming.DimCache(path, Seq("c_custkey"))
    })

  val queries: Map[String, QFn] = Map(
    // J4/J5 at scale — lookup join against a dim TOO LARGE TO BROADCAST:
    // the dim lives in a bucketed KeyedStore; the batch scans only the
    // buckets its keys hash to, pinned executor-local with generation
    // invalidation (DimCache — the reference's Redis-cached HBase lookup).
    // The join is SHUFFLE_MERGE by construction; PlanSpec pins the
    // no-broadcast plan shape.
    "q_join_lookup_big" -> { (s, dir) =>
      val o = Envelopes.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      customerCache(s, dir).lookupJoin(o, Seq(col("o_custkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("o_orderkey"))
    },

    // J1 — inner equi-join: order_detail ⋈ order_info on od.order_id = oi.id.
    "q_join_inner" -> { (s, dir) =>
      val od = Envelopes.orderDetail(s, dir)
      val oi = Envelopes.orderInfo(s, dir)
      Joins.inner(od, oi, od("order_id") === oi("id"))
        .select(od("id"), od("order_id"), od("sku_id"), od("sku_num"),
          oi("user_id"), oi("province_id"), oi("order_status"))
        .orderBy(od("id"), od("sku_id"), od("sku_num"))
    },

    // J2 — double left outer join: od ⟕ activity ⟕ coupon on od.id.
    "q_join_left" -> { (s, dir) =>
      val od  = Envelopes.orderDetail(s, dir)
      val oda = Envelopes.orderDetailActivity(s, dir)
      val odc = Envelopes.orderDetailCoupon(s, dir)
      Joins.leftOuter(Joins.leftOuter(od, oda, od("id") === oda("id")),
          odc, od("id") === odc("id"))
        .select(od("id"), od("order_id"), od("sku_id"),
          oda("activity_id"), odc("coupon_id"))
        .orderBy(od("id"), od("sku_id"), oda("activity_id"), odc("coupon_id"))
    },

    // J3 — interval join: purchase ⋈ view of the same user with
    // purchase.ts ∈ [view.ts - 15 min, view.ts + 5 s] (epoch-ms arithmetic).
    "q_join_interval" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_millis(ts)").as("ts_ms"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts_ms").as("p_ts"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts_ms").as("v_ts"))
      Joins.interval(p, v,
          (col("p_user"), col("v_user")), (col("p_ts"), col("v_ts")),
          lowerMs = 15 * 60 * 1000L, upperMs = 5000L)
        .select(col("p_id"), col("v_id"), col("p_user").as("user_id"),
          col("p_ts"), col("v_ts"))
        .orderBy(col("p_id"), col("v_id"))
    },

    // J4 — lookup join (inner): comment.appraise → dim rowkey, broadcast dim.
    "q_join_lookup" -> { (s, dir) =>
      val c = Envelopes.table(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        (col("l_partkey") % 25).cast("string").as("appraise"))
      val dim = Envelopes.dimBaseDic(s, dir)
      Joins.lookup(c, dim, c("appraise") === dim("rowkey"))
        .select(col("id"), col("appraise"), col("dic_name"))
        .orderBy(col("id"), col("appraise"))
    },

    // J5 — lookup join (left): unknown payment_type keeps row, null dic_name.
    "q_join_lookup_left" -> { (s, dir) =>
      val p = Envelopes.table(s, dir, "lineitem").select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        (col("l_partkey") % 30).cast("string").as("payment_type"))
      val dim = Envelopes.dimBaseDic(s, dir)
      Joins.lookup(p, dim, p("payment_type") === dim("rowkey"), leftOuter = true)
        .select(col("id"), col("payment_type"), col("dic_name"))
        .orderBy(col("id"), col("payment_type"))
    },

    // Pure range join (no equi key) via bin bucketing: events priced into
    // part bands, value ∈ [lo, lo+9]. The bin is the hash-join key; the
    // BETWEEN is the residual — never a nested loop.
    "q_range_join" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir).select(col("event_id"), col("value"))
      val bands = Envelopes.table(s, dir, "part").filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("band_part"),
          ((col("p_partkey") % 50) * 10).cast("double").as("lo"),
          ((col("p_partkey") % 50) * 10 + 9).cast("double").as("hi"))
      Joins.rangeBin(ev, bands, col("value"), col("lo"), col("hi"), binWidth = 10.0)
        .select(col("event_id"), col("band_part"), col("lo"), col("value"))
        .orderBy(col("event_id"), col("band_part"))
    },

    // As-of join — last-touch attribution: each purchase picks the user's
    // latest view at or before the purchase time (none → nulls). The view
    // side is pre-compacted to one row per (user, ts) so "the latest" is
    // well-defined. Union-sort formulation: one shuffle, no pair explosion.
    "q_asof_touch" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("unix_millis(ts)").as("ts_ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts_ms"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_ms"))
        .agg(max(col("event_id")).as("v_id"))
        .select(col("user_id"), col("ts_ms"), col("v_id"), col("ts_ms").as("v_ts"))
      Joins.asof(purchases, views, key = "user_id", ts = "ts_ms",
          rightPayload = Seq("v_id", "v_ts"))
        .orderBy(col("p_id"))
    },

    // J6 — broadcast config join: CDC stream ⋈ config on table = source_table.
    "q_join_broadcast" -> { (s, dir) =>
      val mx  = Project.etlFilter(Envelopes.maxwell(s, dir))
      val cfg = Envelopes.configDim(s)
      Joins.broadcastConfig(mx, cfg, mx("table") === cfg("sourceTable"))
        .select(element_at(col("data"), "id").as("id"),
          col("sinkTable").as("sink_table"), col("sinkRowKey").as("sink_row_key"))
        .orderBy(col("id").cast("long"))
    })

  import Envelopes.{maxwellCte => MX, odCte, oiCte, odaCte, odcCte, dimCte}

  val oracles: Map[String, String] = Map(
    "q_join_lookup_big" ->
      """SELECT o_orderkey, o_custkey, c_name, c_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_inner" ->
      s"""WITH $odCte, $oiCte
         |SELECT od.id, od.order_id, od.sku_id, od.sku_num,
         |       oi.user_id, oi.province_id, oi.order_status
         |FROM od JOIN oi ON od.order_id = oi.id
         |ORDER BY od.id, od.sku_id, od.sku_num""".stripMargin,

    "q_join_left" ->
      s"""WITH $odCte, $odaCte, $odcCte
         |SELECT od.id, od.order_id, od.sku_id, oda.activity_id, odc.coupon_id
         |FROM od LEFT JOIN oda ON od.id = oda.id LEFT JOIN odc ON od.id = odc.id
         |ORDER BY od.id, od.sku_id, oda.activity_id, odc.coupon_id""".stripMargin,

    "q_join_interval" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events)
        |SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id,
        |       p.ts_ms AS p_ts, v.ts_ms AS v_ts
        |FROM ev p JOIN ev v
        |  ON p.user_id = v.user_id AND p.event_type = 'purchase' AND v.event_type = 'view'
        | AND p.ts_ms BETWEEN v.ts_ms - 900000 AND v.ts_ms + 5000
        |ORDER BY p_id, v_id""".stripMargin,

    "q_join_lookup" ->
      s"""WITH $dimCte
         |SELECT l_orderkey * 10 + l_linenumber AS id,
         |       CAST(l_partkey % 25 AS VARCHAR) AS appraise, dic_name
         |FROM lineitem JOIN dic ON CAST(l_partkey % 25 AS VARCHAR) = rowkey
         |ORDER BY id, appraise""".stripMargin,

    "q_join_lookup_left" ->
      s"""WITH $dimCte
         |SELECT l_orderkey * 10 + l_linenumber AS id,
         |       CAST(l_partkey % 30 AS VARCHAR) AS payment_type, dic_name
         |FROM lineitem LEFT JOIN dic ON CAST(l_partkey % 30 AS VARCHAR) = rowkey
         |ORDER BY id, payment_type""".stripMargin,

    "q_range_join" ->
      """WITH b AS (
        |  SELECT p_partkey AS band_part,
        |         CAST((p_partkey % 50) * 10 AS DOUBLE) AS lo,
        |         CAST((p_partkey % 50) * 10 + 9 AS DOUBLE) AS hi
        |  FROM part WHERE p_partkey < 200)
        |SELECT e.event_id, b.band_part, b.lo, e.value
        |FROM events e JOIN b ON e.value BETWEEN b.lo AND b.hi
        |ORDER BY e.event_id, b.band_part""".stripMargin,

    "q_asof_touch" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts_ms FROM ev
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts_ms AS v_ts, MAX(event_id) AS v_id FROM ev
        |      WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.p_id, p.user_id, p.ts_ms, v.v_id, v.v_ts
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND p.ts_ms >= v.v_ts
        |ORDER BY p.p_id""".stripMargin,

    "q_join_broadcast" ->
      s"""WITH $MX
         |SELECT id, 'dim_cart_info' AS sink_table, 'id' AS sink_row_key FROM mx
         |WHERE db = 'gmall' AND typ NOT IN ('bootstrap-start','bootstrap-complete')
         |  AND tbl = 'cart_info'
         |ORDER BY CAST(id AS BIGINT)""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Joins, Project, Windows}

/** Verify queries for the DWS windowed-aggregation surface (SURVEY.md §2.9) —
  * the 8 summary tables the reference declares at `Constant.java:40-47` but
  * never implements. Tumbling 1-hour event-time windows keyed by `ws` (window
  * start, epoch seconds).
  */
object DwsQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** 40 common hanzi used to derive a deterministic CJK fixture string from
    * doc_id in BOTH engines (`substr` is character-based in Spark and
    * DuckDB; Spark's `char()` wraps at 256, so codepoint building is out). */
  private val CjkAlphabet =
    "一二三四五六七八九十百千万上下左右中大小天地人口日月水火山石田土木金竹虫鱼鸟风云"

  private def pages(s: SparkSession, dir: String): DataFrame =
    Project.logEtl(Envelopes.logRecords(s, dir)).filter(col("page").isNotNull)

  val queries: Map[String, QFn] = Map(
    // dws_traffic_source_keyword_page_view_window — tokenizer + WINDOWED
    // keyword counts (the *_window contract of Constant.java:40). The
    // documents fixture has no ts column; event time is derived
    // deterministically as one doc per minute, so each 1-hour window spans
    // 60 doc_ids.
    "q_dws_keyword" -> { (s, dir) =>
      val timed = Envelopes.table(s, dir, "documents")
        .withColumn("__ts_ms", col("doc_id") * 60000)
      Windows.withTumbleWs(timed, col("__ts_ms"), "1 hour")
        .select(col("ws"), explode(Windows.tokenize(col("text"))).as("keyword"))
        .groupBy(col("ws"), col("keyword")).agg(count(lit(1)).as("kw_ct"))
        .orderBy(col("ws"), col("keyword"))
    },

    // The CJK capability behind the same table (ikanalyzer, pom.xml:205):
    // gmall search keywords are Chinese, where words are not space-delimited.
    // The fixture derives a deterministic mixed latin+hanzi keyword string
    // per doc by indexing a 40-hanzi alphabet with doc_id arithmetic — both
    // engines build the identical string, so the bigram tokenization is
    // fully hash-checkable.
    "q_dws_keyword_cjk" -> { (s, dir) =>
      val a = lit(CjkAlphabet)
      val one = lit(1)
      val kw = concat(lit("kw"), (col("doc_id") % 7).cast("string"), lit(" "),
        a.substr((one + col("doc_id") % 40).cast("int"), one),
        a.substr((one + expr("doc_id div 5") % 40).cast("int"), one),
        a.substr((one + expr("doc_id div 25") % 40).cast("int"), one))
      Envelopes.table(s, dir, "documents")
        .select(explode(Windows.tokenize(kw)).as("keyword"))
        .groupBy(col("keyword")).agg(count(lit(1)).as("kw_ct"))
        .orderBy(col("keyword"))
    },

    // dws_traffic_vc_ch_ar_is_new_page_view_window — pv/uv/duration per dims.
    "q_dws_vc_ch_ar" -> { (s, dir) =>
      Windows.withTumbleWs(pages(s, dir), col("ts"), "1 hour")
        .groupBy(col("ws"), col("common.vc").as("vc"), col("common.ch").as("ch"),
          col("common.ar").as("ar"), col("common.is_new").as("is_new"))
        .agg(count(lit(1)).as("pv"),
          countDistinct(col("common.mid")).as("uv"),
          sum(col("page.during_time")).as("dur_sum"))
        .orderBy(col("ws"), col("vc"), col("ch"), col("ar"), col("is_new"))
    },

    // dws_traffic_home_detail_page_view_window — independent visitors per page.
    "q_dws_home_detail" -> { (s, dir) =>
      Windows.withTumbleWs(
          pages(s, dir).filter(col("page.page_id").isin("home", "good_detail")),
          col("ts"), "1 hour")
        .groupBy(col("ws"), col("page.page_id").as("page_id"))
        .agg(countDistinct(col("common.mid")).as("uv"))
        .orderBy(col("ws"), col("page_id"))
    },

    // dws_user_user_login_window — unique + 7-day-returning users per window.
    "q_dws_login" -> { (s, dir) =>
      val logins = Project.logEtl(Envelopes.logRecords(s, dir))
        .filter(col("common.uid").isNotNull)
        .select(col("event_id"), col("common.uid").as("uid"), col("ts"))
      val w = Window.partitionBy(col("uid")).orderBy(col("ts"), col("event_id"))
      val withPrev = logins.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      Windows.withTumbleWs(withPrev, col("ts"), "1 hour")
        .groupBy(col("ws"))
        .agg(countDistinct(col("uid")).as("uu_ct"),
          countDistinct(when(col("prev_ts").isNotNull &&
            col("ts") - col("prev_ts") > 7L * 24 * 3600 * 1000, col("uid"))).as("back_ct"))
        .orderBy(col("ws"))
    },

    // dws_user_user_register_window — registrations per window.
    "q_dws_register" -> { (s, dir) =>
      Windows.withTumbleWs(
          Project.logEtl(Envelopes.logRecords(s, dir)).filter(col("start").isNotNull),
          col("ts"), "1 hour")
        .groupBy(col("ws")).agg(count(lit(1)).as("register_ct"))
        .orderBy(col("ws"))
    },

    // dws_trade_cart_add_uu_window — cart-add unique users per window.
    "q_dws_cart_uu" -> { (s, dir) =>
      val carts = Project.routeFilter(Envelopes.maxwell(s, dir), "cart_info", Seq("insert"))
        .select(element_at(col("data"), "user_id").as("user_id"), (col("ts") * 1000).as("ts_ms"))
      Windows.withTumbleWs(carts, col("ts_ms"), "1 hour")
        .groupBy(col("ws")).agg(countDistinct(col("user_id")).as("uu_ct"))
        .orderBy(col("ws"))
    },

    // dws_trade_sku_order_window — per-SKU amounts, dim enrichment AFTER agg.
    "q_dws_sku" -> { (s, dir) =>
      val od  = Envelopes.orderDetail(s, dir)
      val agged = Windows.withTumbleWs(od, (col("ts") * 1000).as("ts_ms"), "1 hour")
        .groupBy(col("ws"), col("sku_id"))
        .agg(count(lit(1)).as("order_ct"),
          Envelopes.moneySum(col("split_total_amount")).as("amount"))
      val part = Envelopes.table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
      Joins.lookup(agged, part, col("sku_id") === col("p_partkey"))
        .select(col("ws"), col("sku_id"), col("p_brand"), col("p_type"),
          col("order_ct"), col("amount"))
        .orderBy(col("ws"), col("sku_id"))
    },

    // dws_trade_province_order_window — per-province monthly counts/amounts.
    "q_dws_province" -> { (s, dir) =>
      Envelopes.orderInfo(s, dir)
        .withColumn("mon", date_format(timestamp_seconds(col("order_ts")), "yyyy-MM"))
        .groupBy(col("province_id"), col("mon"))
        .agg(count(lit(1)).as("order_ct"), countDistinct(col("user_id")).as("user_ct"))
        .orderBy(col("province_id"), col("mon"))
    })

  import Envelopes.{maxwellCte => MX, logCte => LG, odCte, oiCte}

  private val VALID = "(has_page OR has_start) AND mid IS NOT NULL"

  val oracles: Map[String, String] = Map(
    "q_dws_keyword" ->
      """SELECT ws, keyword, COUNT(*) AS kw_ct FROM (
        |  SELECT (doc_id // 60) * 3600 AS ws,
        |         unnest(string_split(lower(text), ' ')) AS keyword
        |  FROM documents)
        |WHERE keyword <> ''
        |GROUP BY ws, keyword ORDER BY ws, keyword""".stripMargin,

    "q_dws_keyword_cjk" -> {
      val a = s"'$CjkAlphabet'"
      s"""WITH f AS (
         |  SELECT 'kw' || (doc_id % 7) AS w,
         |         substr($a, CAST(1 + doc_id % 40 AS INT), 1)
         |         || substr($a, CAST(1 + (doc_id // 5) % 40 AS INT), 1)
         |         || substr($a, CAST(1 + (doc_id // 25) % 40 AS INT), 1) AS cjk
         |  FROM documents),
         |t AS (
         |  SELECT w AS keyword FROM f
         |  UNION ALL SELECT substr(cjk, 1, 2) FROM f
         |  UNION ALL SELECT substr(cjk, 2, 2) FROM f)
         |SELECT keyword, COUNT(*) AS kw_ct FROM t
         |GROUP BY keyword ORDER BY keyword""".stripMargin
    },

    "q_dws_vc_ch_ar" ->
      s"""WITH $LG
         |SELECT (ts // 3600000) * 3600 AS ws, vc, ch, ar, is_new,
         |       COUNT(*) AS pv, COUNT(DISTINCT mid) AS uv,
         |       CAST(SUM(during_time) AS BIGINT) AS dur_sum
         |FROM lg WHERE $VALID AND has_page
         |GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 2, 3, 4, 5""".stripMargin,

    "q_dws_home_detail" ->
      s"""WITH $LG
         |SELECT (ts // 3600000) * 3600 AS ws, page_id, COUNT(DISTINCT mid) AS uv
         |FROM lg WHERE $VALID AND page_id IN ('home', 'good_detail')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_dws_login" ->
      s"""WITH $LG,
         |logins AS (
         |  SELECT event_id, uid, ts,
         |         lag(ts) OVER (PARTITION BY uid ORDER BY ts, event_id) AS prev_ts
         |  FROM lg WHERE $VALID AND uid IS NOT NULL)
         |SELECT (ts // 3600000) * 3600 AS ws,
         |       COUNT(DISTINCT uid) AS uu_ct,
         |       COUNT(DISTINCT CASE WHEN prev_ts IS NOT NULL AND ts - prev_ts > 604800000
         |                           THEN uid END) AS back_ct
         |FROM logins GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dws_register" ->
      s"""WITH $LG
         |SELECT (ts // 3600000) * 3600 AS ws, COUNT(*) AS register_ct
         |FROM lg WHERE $VALID AND has_start
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dws_cart_uu" ->
      s"""WITH $MX
         |SELECT (ts // 3600) * 3600 AS ws, COUNT(DISTINCT user_id) AS uu_ct
         |FROM mx WHERE db = 'gmall' AND tbl = 'cart_info' AND typ = 'insert'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dws_sku" ->
      s"""WITH $odCte
         |SELECT (od.ts // 3600) * 3600 AS ws, od.sku_id, p.p_brand, p.p_type,
         |       COUNT(*) AS order_ct,
         |       CAST(SUM(CAST(od.split_total_amount AS DECIMAL(18,6))) AS DOUBLE) AS amount
         |FROM od JOIN part p ON od.sku_id = p.p_partkey
         |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2""".stripMargin,

    "q_dws_province" ->
      s"""WITH $oiCte
         |SELECT province_id, strftime(make_timestamp(order_ts * 1000000), '%Y-%m') AS mon,
         |       COUNT(*) AS order_ct, COUNT(DISTINCT user_id) AS user_ct
         |FROM oi GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}

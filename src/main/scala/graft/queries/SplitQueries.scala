package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.{Project, Split}

/** Verify queries for the 5-way log split + explode (SURVEY.md §2.6). */
object SplitQueries {
  type QFn = (SparkSession, String) => DataFrame

  private def valid(s: SparkSession, dir: String): DataFrame =
    Project.logEtl(Envelopes.logRecords(s, dir))

  val queries: Map[String, QFn] = Map(
    // X1 — page branch (main output).
    "q_split_page" -> { (s, dir) =>
      Split.pageBranch(valid(s, dir))
        .select(col("event_id"), col("common.mid").as("mid"),
          col("page.page_id").as("page_id"), col("page.last_page_id").as("last_page_id"),
          col("page.item").as("item"), col("page.during_time").as("during_time"), col("ts"))
        .orderBy(col("event_id"))
    },

    // X1 — start branch.
    "q_split_start" -> { (s, dir) =>
      Split.startBranch(valid(s, dir))
        .select(col("event_id"), col("common.mid").as("mid"),
          col("start.entry").as("entry"), col("start.open_ad_id").as("open_ad_id"),
          col("start.loading_time").as("loading_time"), col("ts"))
        .orderBy(col("event_id"))
    },

    // X1 — err branch.
    "q_split_err" -> { (s, dir) =>
      Split.errBranch(valid(s, dir))
        .select(col("event_id"), col("common.mid").as("mid"),
          col("err.error_code").as("error_code"), col("err.msg").as("msg"), col("ts"))
        .orderBy(col("event_id"))
    },

    // X2 — actions[] explode (the second exploded array, `DwdBaseLog.java:111`).
    "q_explode_actions" -> { (s, dir) =>
      Split.explodeWithParent(valid(s, dir), col("actions"),
          Seq(col("event_id"), col("common.mid").as("mid")), "a")
        .select(col("event_id"), col("mid"),
          col("a.action_id").as("action_id"), col("a.item").as("item"),
          col("a.ts").as("action_ts"))
        .orderBy(col("event_id"))
    },

    // X2 — displays[] explode with parent enrichment.
    "q_explode" -> { (s, dir) =>
      Split.explodeWithParent(valid(s, dir), col("displays"),
          Seq(col("event_id"), col("common.mid").as("mid"), col("ts")), "d")
        .select(col("event_id"), col("mid"), col("ts"),
          col("d.item").as("item"), col("d.pos_id").as("pos_id"))
        .orderBy(col("event_id"), col("pos_id"))
    })

  import Envelopes.{logCte => LG}

  private val VALID = "(has_page OR has_start) AND mid IS NOT NULL"

  val oracles: Map[String, String] = Map(
    "q_split_page" ->
      s"""WITH $LG
         |SELECT event_id, mid, page_id, last_page_id, item, during_time, ts FROM lg
         |WHERE $VALID AND has_page
         |ORDER BY event_id""".stripMargin,

    "q_split_start" ->
      s"""WITH $LG
         |SELECT event_id, mid, entry,
         |       event_id % 7 AS open_ad_id, loading_time, ts FROM lg
         |WHERE $VALID AND has_start
         |ORDER BY event_id""".stripMargin,

    "q_split_err" ->
      s"""WITH $LG
         |SELECT event_id, mid, event_id % 100 AS error_code,
         |       'boom' AS msg, ts FROM lg
         |WHERE $VALID AND has_err
         |ORDER BY event_id""".stripMargin,

    "q_explode_actions" ->
      s"""WITH $LG
         |SELECT event_id, mid, 'favor_add' AS action_id,
         |       CAST(event_id % 50 AS VARCHAR) AS item, ts AS action_ts
         |FROM lg WHERE $VALID AND page_id = 'good_detail'
         |ORDER BY event_id""".stripMargin,

    "q_explode" ->
      s"""WITH $LG,
         |purch AS (SELECT event_id, mid, ts FROM lg
         |          WHERE $VALID AND page_id = 'cart')
         |SELECT event_id, mid, ts, item, pos_id FROM (
         |  SELECT event_id, mid, ts, CAST(event_id % 50 AS VARCHAR) AS item, 1 AS pos_id FROM purch
         |  UNION ALL
         |  SELECT event_id, mid, ts, CAST((event_id + 1) % 50 AS VARCHAR) AS item, 2 AS pos_id FROM purch)
         |ORDER BY event_id, pos_id""".stripMargin)
}

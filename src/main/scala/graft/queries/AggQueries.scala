package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelopes
import graft.ops.Windows

/** Ranking / session-window / rollup aggregations — the "top-k-ready outputs"
  * operator class SURVEY.md §2.9 calls out, plus gap-based sessionization
  * (the reference's session metric is `last_page_id IS NULL` starts; the
  * Spark-native form is `session_window`, verified against a lag/gap oracle).
  */
object AggQueries {
  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // Per-window top-3 SKUs by exact decimal amount (row_number ranking).
    "q_topk_sku" -> { (s, dir) =>
      val od = Envelopes.orderDetail(s, dir)
      val agged = Windows.withTumbleWs(od, (col("ts") * 1000).as("ts_ms"), "24 hours")
        .groupBy(col("ws"), col("sku_id"))
        .agg(Envelopes.moneySum(col("split_total_amount")).as("amount"))
      agged.withColumn("rk", row_number().over(
          Window.partitionBy(col("ws")).orderBy(col("amount").desc, col("sku_id"))))
        .filter(col("rk") <= 3)
        .select(col("ws"), col("rk"), col("sku_id"), col("amount"))
        .orderBy(col("ws"), col("rk"))
    },

    // Gap-based session windows (30 min) per user over events. The timestamp
    // is truncated to milliseconds first: the oracle compares gaps on
    // epoch_ms, and a micro-precision gap of 1799999.6 ms would merge in
    // Spark but split in the floored-ms oracle.
    "q_session_window" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .withColumn("ts", timestamp_millis(expr("unix_millis(ts)")))
      val sessions = ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("ev_ct"))
      sessions.groupBy(col("user_id"))
        .agg(count(lit(1)).as("session_ct"), sum(col("ev_ct")).as("event_ct"))
        .orderBy(col("user_id"))
    },

    // Hopping (sliding) windows: 1-hour windows every 30 min — each event
    // lands in exactly two windows; pv per (window, event_type).
    "q_dws_sliding" -> { (s, dir) =>
      Envelopes.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("pv"))
        .select(expr("unix_millis(window.start) div 1000").as("ws"),
          col("event_type"), col("pv"))
        .orderBy(col("ws"), col("event_type"))
    },

    // CUMULATE windows (FLIP-145, the fourth Flink window TVF): daily
    // windows emitting 6-hourly cumulative pv + exact uv — each event
    // joins its remaining step boundaries (×(size/step) rows, priced),
    // then one map-side-combined aggregate.
    "q_cumulate" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(expr("unix_millis(ts)").as("tms"), col("user_id"))
      graft.ops.Windows.withCumulate(ev, col("tms"),
          stepMs = 21600000L, sizeMs = 86400000L)
        .groupBy("ws", "bound")
        .agg(count(lit(1)).as("ev_ct"), countDistinct(col("user_id")).as("uv"))
        .orderBy(col("ws"), col("bound"))
    },

    // Province × month rollup (subtotals + grand total).
    "q_rollup_province" -> { (s, dir) =>
      Envelopes.orderInfo(s, dir)
        .withColumn("mon", date_format(timestamp_seconds(col("order_ts")), "yyyy-MM"))
        .rollup(col("province_id"), col("mon"))
        .agg(count(lit(1)).as("order_ct"))
        .orderBy(col("province_id").asc_nulls_first, col("mon").asc_nulls_first)
    },

    // Ordered funnel (view → click → purchase): stage N counts users whose
    // earliest stage-N event strictly follows their stage-(N−1) entry time.
    // Scale shape: three keyed aggregations + two equi-joins on user_id —
    // every stage shares the user_id shuffle key, no window over raw events.
    "q_funnel" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("user_id"), col("event_type"), expr("unix_millis(ts)").as("tms"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("tms")).as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("tms") > col("t_view"))
        .groupBy("user_id").agg(min(col("tms")).as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("tms") > col("t_click"))
        .groupBy("user_id").agg(min(col("tms")).as("t_buy"))
      v.agg(count(lit(1)).as("users")).withColumn("stage", lit("1_view"))
        .unionByName(c.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("2_click_after_view")))
        .unionByName(p.agg(count(lit(1)).as("users"))
          .withColumn("stage", lit("3_purchase_after_click")))
        .select(col("stage"), col("users"))
        .orderBy(col("stage"))
    },

    // Day-N retention cohorts: users cohorted by first-activity day, counted
    // on each of the next 7 days they return. One shuffle to find cohorts,
    // one co-keyed join back, one (cohort, offset) rollup.
    "q_retention" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      ev.join(first, Seq("user_id"))
        .withColumn("day_n", col("day") - col("cohort_day"))
        .filter(col("day_n") <= 7)
        .groupBy(col("cohort_day"), col("day_n"))
        .agg(countDistinct(col("user_id")).as("users"))
        .orderBy(col("cohort_day"), col("day_n"))
    },

    // Session journey paths: 30-min gap sessions per user, each emitting its
    // ordered event-type path ("view>click>purchase") — the path-analysis
    // rollup funnels are mined from.
    "q_journey" -> { (s, dir) =>
      Windows.sessionPaths(Envelopes.events(s, dir), col("user_id"),
          timestamp_millis(expr("unix_millis(ts)")), col("event_type"),
          col("event_id"))
        .orderBy(col("user_id"), col("sess_start"))
    },

    // Hourly forward-fill resample per user (gap filling onto a fixed grid,
    // composed from the single-shuffle as-of join).
    "q_resample" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("user_id"), expr("unix_millis(ts)").as("tms"),
          col("value"), col("event_id"))
      Windows.resampleFfill(ev, "user_id", "tms", Seq("value"),
          stepMs = 3600000L, ordCol = col("event_id"))
        .orderBy(col("user_id"), col("tms"))
    },

    // CEP pattern matching (Flink-CEP `followedBy ... within`, skip past
    // last row): every view→click→purchase run per user completing within
    // seven days of its first event. Oracle = recursive-CTE automaton over
    // the same (stage, start) state.
    "q_cep" -> { (s, dir) =>
      graft.ops.Cep.patternMatches(Envelopes.events(s, dir), col("user_id"),
          expr("unix_millis(ts)"), col("event_id"), col("event_type"),
          Seq("view", "click", "purchase"), withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // GROUP pattern (Flink-CEP Pattern.begin(subPattern).times(n),
    // round 13 — the one unported Flink-CEP construct): the (view,
    // click) sub-pattern repeated WHOLE exactly twice within seven
    // days. Exact-count group times is semantically the UNROLLED stage
    // list (Flink's own NFA expansion), so the operator delegates to
    // the routed 4-stage automaton and the oracle is the generic
    // recursive-CTE twin on the unrolled stages.
    "q_cep_group" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesGroup(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), group = Seq("view", "click"), times = 2,
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // Cross-batch GROUP-pattern CEP over the persistent store: the
    // (view, click) × 2 group driven through three time-cut folds of
    // IncrementalCep.foldBatchGroup — the unroll delegation inherits
    // foldBatch's replay protocol and seeded state, so the store drive
    // and the batch operator are one automaton. Oracle = q_cep_group's
    // generated CTE verbatim.
    "q_cep_group_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepg_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchGroup(p, s"$root/cep",
          group = Seq("view", "click"), times = 2,
          withinMs = 604800000L, batchId = i + 1L)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // Cross-batch BRANCHING-NFA CEP over the persistent store: q_cep_nfa's
    // choice-point pattern driven through three time-cut folds of
    // IncrementalCep.foldBatchNfa — the branch FAMILY (stage, count pairs
    // sharing one start) crosses batch boundaries through the store's br
    // column, so a family forked in one fold completes in a later one.
    // Oracle = q_cep_nfa's two-stage-reduction CTE verbatim.
    "q_cep_nfa_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepn_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchNfa(p, s"$root/cep",
          Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1)),
          withinMs = 604800000L, batchId = i + 1L)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // BRANCHING-NFA opt-in (round 13 — the overlapWarnings class made
    // usable): (view)(click optional)(click) within 7 days. The greedy
    // reading feeds the optional stage first and loses the one-click
    // matches Flink's branching NFA finds; the opt-in explores every
    // branch and emits at the family's earliest completion. On THIS
    // pattern the branch automaton provably reduces to the two-stage
    // view→click machine (the skip branch always completes first, the
    // optional branch never completes earlier), so the oracle is the
    // generic CTE on (view, click) — an independent SQL derivation of
    // the reduction.
    "q_cep_nfa" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesTimesNfa(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"),
          Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1)),
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP with MATCH-PAYLOAD OUTPUT (Flink-CEP select()/flatSelect()):
    // the same view→click→purchase automaton as q_cep, but returning the
    // MATCHED EVENTS per stage — which view opened, which click converted,
    // which purchase closed — one row per matched stage event (long
    // format, scalar columns). Oracle = the q_cep recursive-CTE automaton
    // with per-stage (tms, oid) captures threaded through the state and a
    // 3-way unroll on emit.
    "q_cep_select" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesSelect(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "click", "purchase"),
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"), col("stage_n"))
    },

    // Cross-batch MATCH-PAYLOAD CEP over the persistent store:
    // q_cep_select's pattern driven through three time-cut folds of
    // IncrementalCep.foldBatchSelect — the per-stage event captures
    // CROSS batch boundaries through the store's es column, so a match
    // spanning folds still reports all three events. Oracle =
    // q_cep_select's automaton CTE verbatim.
    "q_cep_select_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepsel_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchSelect(p, s"$root/cep",
          Seq("view", "click", "purchase"), withinMs = 604800000L,
          batchId = i + 1L)
      }
      // cross-fold match numbering ranks over the envelope PLUS m_oid
      // (the match's stage-1 event oid — unique per match under skip past
      // last row): two matches of one key whose envelopes tie exactly
      // (all events at tied timestamps) would collapse under an
      // envelope-only dense_rank; since matches never overlap, m_oid
      // order IS emission order within an envelope tie
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", dense_rank().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"), col("m_oid"))))
        .select(col("user_id"), col("match_n"), col("stage_n"),
          col("ev_tms"), col("ev_oid"))
        .orderBy(col("user_id"), col("match_n"), col("stage_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // CEP with STRICT CONTIGUITY (Flink-CEP next): every view whose
    // IMMEDIATELY following event — of ANY type, which is why the scan
    // cannot pre-filter — is a click within one day. Oracle = the same
    // automaton over the unfiltered per-user event sequence.
    "q_cep_next" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesNext(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "click"),
          withinMs = 86400000L, nextStages = Set(1))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP with STRICT NEGATION (Flink-CEP notNext): every view→purchase
    // run (relaxed wait, 3 days) where the event IMMEDIATELY after the
    // view — of ANY type, hence the unfiltered scan — is not an error;
    // any other very-next event discharges the ban. Oracle = the same
    // automaton with the fresh-slot flag over the unfiltered sequence.
    "q_cep_notnext" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesNext(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "purchase"),
          withinMs = 259200000L, nextStages = Set.empty,
          notNext = Map(1 -> Seq("error")))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // Cross-batch CEP driven over a PERSISTENT state store: the events
    // table split into three consecutive TIME ranges (the cross-batch
    // order contract), each folded into IncrementalCep's KeyedStore state;
    // matches accumulate across folds and a run begun in one fold
    // completes in a later one. Oracle = q_cep's batch automaton verbatim
    // (the fold shares the batch step function, so concatenated folds
    // equal the batch operator wherever the cuts fall).
    "q_cep_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cep_q")
      val pat = Seq(("view", 1, 1), ("click", 1, 1), ("purchase", 1, 1))
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatch(p, s"$root/cep", pat,
          withinMs = 604800000L, batchId = i + 1L)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // CEP with QUANTIFIERS (Flink-CEP timesOrMore + greedy): at least
    // THREE views (greedy unbounded loop) then a purchase, completing
    // within seven days of the first view. Oracle = recursive-CTE automaton
    // over the (count, start) state — the loop counter is the only state
    // beyond q_cep's.
    "q_cep_times" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesTimes(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"),
          Seq(("view", 3, graft.ops.Cep.Unbounded), ("purchase", 1, 1)),
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP until() — Flink's stop condition on a GREEDY UNBOUNDED FINAL
    // loop (round 15, VERDICT r14 item 6): at least TWO clicks
    // accumulating until a purchase CLOSES the loop within seven days of
    // the first click; the purchase is NOT part of the match (end = the
    // last accepted click). Oracle = recursive-CTE automaton over
    // (c, t0, te) — te (last loop event) is the only state beyond
    // q_cep_times', revealed as the match end by the stop event.
    "q_cep_until" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesUntil(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"),
          Seq(("click", 2, graft.ops.Cep.Unbounded)),
          untilType = "purchase", withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP under AFTER MATCH SKIP TO NEXT ROW: overlapping runs — EVERY
    // view starts its own view→click→purchase run and emits its earliest
    // completion within seven days. Oracle = the static stage unroll
    // (min-seq per stage per start), exact because runs never interact.
    "q_cep_skipnext" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesSkipNext(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "click", "purchase"),
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // Cross-batch SKIP-TO-NEXT CEP over the persistent store (round 12 —
    // the last drive form: every primitive now runs batch, fMGWS, AND
    // store-backed): q_cep_skipnext's overlapping-runs pattern driven
    // through three time-cut folds of IncrementalCep.foldBatchSkipNext —
    // the ACTIVE RUN SET crosses batch boundaries through the store's
    // runs column, so a run opened in one fold completes in a later one.
    // Oracle = q_cep_skipnext's static-unroll CTE verbatim (match_n by
    // (start, end) equals the oracle's start-order numbering: runs are
    // monotone, so equal-start runs order by end, and full ties are
    // row-identical).
    "q_cep_skipnext_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepsk_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchSkipNext(p, s"$root/cep",
          Seq("view", "click", "purchase"), withinMs = 604800000L,
          batchId = i + 1L)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // CEP with a CONSECUTIVE loop (round 12 — Flink-CEP
    // times(2,∞).consecutive(): at least TWO strictly-adjacent views —
    // ANY other event breaks the run of views, which is why the scan
    // cannot pre-filter — then a purchase, relaxed, within seven days.
    // A break at/above the floor CLOSES the loop (longest-unbroken-run
    // determinization); below it, the partial dies. Oracle = recursive-
    // CTE automaton over the UNFILTERED sequence with the closed flag.
    "q_cep_consec" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesTimesConsecutive(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"),
          Seq(("view", 2, graft.ops.Cep.Unbounded), ("purchase", 1, 1)),
          withinMs = 604800000L, consecutive = Set(0))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // Cross-batch CONSECUTIVE-LOOP CEP over the persistent store:
    // q_cep_consec's pattern driven through three time-cut folds of
    // IncrementalCep.foldBatchConsec — the UNFILTERED event stream
    // reaches every fold (any event can break a loop) and the
    // (st, c, cl, t0) state carries adjacency AND the closed flag
    // across the cuts. Oracle = q_cep_consec's CTE verbatim.
    "q_cep_consec_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepcs_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchConsec(p, s"$root/cep",
          Seq(("view", 2, graft.ops.Cep.Unbounded), ("purchase", 1, 1)),
          withinMs = 604800000L, batchId = i + 1L, consecutive = Set(0))
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // Cross-batch SKIP-TO-FIRST/LAST CEP over the persistent store:
    // q_cep_skipto's pattern driven through three time-cut folds of
    // IncrementalCep.foldBatchSkipTo — the single run's state AND its
    // rewind buffer cross the cuts, so a match completing in a later
    // fold still rewinds into its buffered stage-1 segment. Oracle =
    // q_cep_skipto's rewind-position CTE verbatim.
    "q_cep_skipto_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepst_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchSkipTo(p, s"$root/cep",
          Seq("view", "click", "purchase"), withinMs = 604800000L,
          batchId = i + 1L, skipToStage = 1)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // CEP under AFTER MATCH SKIP TO FIRST/LAST (round 12 — the remaining
    // Flink AfterMatchSkipStrategy members, coinciding on the
    // one-event-per-stage class): after each view→click→purchase match
    // the scan RESUMES AT the matched click, so a later purchase can
    // close a second funnel whose click the first consumed — overlap
    // between skip-past-last-row's none and skip-to-next's every-start.
    // Oracle = a rewind-position recursive CTE: one iteration per
    // processing step, with the scan position jumping back to the
    // buffered stage-1 seq on emit (exactly the SkipToRunner's replay).
    "q_cep_skipto" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesSkipTo(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "click", "purchase"),
          withinMs = 604800000L, skipToStage = 1)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP with an OPTIONAL middle stage (Flink-CEP optional(), min 0
    // unbounded here — oneOrMore().optional()): a view, any number of
    // clicks INCLUDING NONE, then a purchase within seven days. Differs
    // from q_cep exactly on the skip: purchases complete straight from
    // the view when no click intervened. Oracle = recursive-CTE automaton
    // with the skip branch.
    "q_cep_opt" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesTimes(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"),
          Seq(("view", 1, 1), ("click", 0, graft.ops.Cep.Unbounded),
            ("purchase", 1, 1)),
          withinMs = 604800000L)
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP with PREDICATE stages (Flink-CEP where()): a HIGH-VALUE view
    // (value > 60), any click, then a high-value purchase (value > 120)
    // within seven days — stage conditions over event fields, not type
    // labels. The scan pre-filters to the implied type IN (relaxed
    // contiguity makes the union-of-predicates filter semantics-
    // preserving). Oracle = the same automaton with the same predicates.
    "q_cep_where" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesWhere(
          Envelopes.events(s, dir)
            .filter(col("event_type").isin("view", "click", "purchase")),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          stages = Seq(
            ("e.ty = 'view' AND e.value > 60.0", 1, 1),
            ("e.ty = 'click'", 1, 1),
            ("e.ty = 'purchase' AND e.value > 120.0", 1, 1)),
          withinMs = 604800000L,
          payload = Seq("ty" -> col("event_type"), "value" -> col("value")))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // CEP with an ITERATIVE condition (Flink-CEP IterativeCondition):
    // every purchase worth MORE THAN DOUBLE its opening view's value,
    // within seven days — the stage-1 predicate reads the captured
    // stage-0 event (first.value). 2*x on doubles is exponent-exact, so
    // the predicate is engine-portable. Oracle = the automaton CTE with
    // the captured value threaded through the state.
    "q_cep_iter" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesIter(
          Envelopes.events(s, dir)
            .filter(col("event_type").isin("view", "purchase")),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          stages = Seq(
            ("e.ty = 'view'", 1, 1),
            ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1)),
          withinMs = 604800000L,
          payload = Seq("ty" -> col("event_type"), "value" -> col("value")))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    },

    // Cross-batch ITERATIVE CEP over the persistent store: q_cep_iter's
    // pattern (purchase > 2 × the opening view's value) driven through
    // three consecutive time-range folds of IncrementalCep.foldBatchIter —
    // the captured first.value CROSSES batch boundaries through the
    // store's f0 column. Oracle = q_cep_iter's automaton CTE verbatim
    // (the fold shares the batch step function seeded from storage).
    "q_cep_iter_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"),
          col("value"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepit_q")
      val stages = Seq(
        ("e.ty = 'view'", 1, 1),
        ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1))
      val payload = Seq("ty" -> col("ty"), "value" -> col("value"))
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchIter(p, s"$root/cep",
          stages, withinMs = 604800000L, batchId = i + 1L, payload = payload)
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // Cross-batch STRICT-CONTIGUITY CEP over the persistent store:
    // q_cep_next's pattern (view NEXT click within a day) driven through
    // three time-cut folds of IncrementalCep.foldBatchNext — the
    // UNFILTERED event stream reaches every fold (strict adjacency) and
    // the (st, t0, fr) state carries adjacency across the cuts. Oracle =
    // q_cep_next's automaton CTE verbatim.
    "q_cep_next_stream" -> { (s, dir) =>
      val ev = Envelopes.events(s, dir)
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepnx_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchNext(p, s"$root/cep",
          Seq("view", "click"), withinMs = 86400000L, batchId = i + 1L,
          nextStages = Set(1))
      }
      val res = folds.reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      folds.foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // Cross-batch NEGATION CEP over the persistent store: q_cep_neg's
    // pattern (view→purchase, no error between, no click within 3 days
    // after) driven through three time-cut folds of foldBatchNeg, then
    // ONE flushBatchNeg with a watermark past everything — the stream's
    // stand-in for the batch operator's input-end flush, so the drive
    // equals the batch automaton INCLUDING its final-state emission.
    // Oracle = q_cep_neg's CTE verbatim.
    "q_cep_neg_stream" -> { (s, dir) =>
      val pat = Seq("view", "purchase")
      val w = 259200000L
      val ev = Envelopes.events(s, dir)
        .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
          col("event_id").as("oid"), col("event_type").as("ty"))
        .localCheckpoint(true)
      val bounds = ev.agg(min(col("tms")), max(col("tms"))).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val (cut1, cut2) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val root = java.nio.file.Files.createTempDirectory("graft_cepng_q")
      val folds = Seq(
        ev.filter(col("tms") <= cut1),
        ev.filter(col("tms") > cut1 && col("tms") <= cut2),
        ev.filter(col("tms") > cut2)).zipWithIndex.map { case (p, i) =>
        graft.streaming.IncrementalCep.foldBatchNeg(p, s"$root/cep", pat,
          withinMs = w, batchId = i + 1L,
          notBetween = Map(1 -> Seq("error")), notAfter = Seq("click"))
      }
      val flush = graft.streaming.IncrementalCep.flushBatchNeg(s,
        s"$root/cep", pat, watermarkMs = hi + w, withinMs = w, batchId = 4L)
      val res = (folds :+ flush).reduce(_ unionByName _)
        .withColumnRenamed("k", "user_id")
        .withColumn("match_n", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("start_tms"), col("end_tms"))))
        .select(col("user_id"), col("match_n"), col("start_tms"),
          col("end_tms"))
        .orderBy(col("user_id"), col("match_n"))
        .localCheckpoint(true)
      (folds :+ flush).foreach(graft.util.Blocks.freeCheckpoint)
      graft.util.Tmp.deleteRecursively(root)
      graft.util.Blocks.freeCheckpoint(ev)
      res
    },

    // CEP with NEGATION (Flink-CEP notFollowedBy, both positions): every
    // view→purchase run per user with NO error between them and NO click
    // in the three days after the view — the pending match emits when its
    // window closes banned-free (or the input ends: the batch stance for
    // "the click never came"). Oracle = the same automaton as a recursive
    // CTE plus a final-state flush.
    "q_cep_neg" -> { (s, dir) =>
      graft.ops.Cep.patternMatchesNeg(Envelopes.events(s, dir),
          col("user_id"), expr("unix_millis(ts)"), col("event_id"),
          col("event_type"), Seq("view", "purchase"),
          withinMs = 259200000L, notBetween = Map(1 -> Seq("error")),
          notAfter = Seq("click"))
        .withColumnRenamed("k", "user_id")
        .orderBy(col("user_id"), col("match_n"))
    })

  import Envelopes.{odCte, oiCte}

  // the q_cep_skipnext static-unroll oracle (min-seq per stage per
  // start — exact because runs never interact), shared with
  // q_cep_skipnext_stream: the store-backed fold runs the same
  // SkipStepper seeded from storage, so concatenated folds equal the
  // batch operator.
  private val cepSkipSql: String =
    """WITH ev AS (
      |  SELECT user_id, tms, ty,
      |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
      |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
      |               event_type AS ty
      |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
      |v AS (SELECT user_id, seq AS s0, tms AS t0 FROM ev WHERE ty = 'view'),
      |c AS (SELECT v.user_id, v.s0, v.t0, MIN(e.seq) AS c_seq
      |      FROM v JOIN ev e ON e.user_id = v.user_id AND e.seq > v.s0
      |        AND e.ty = 'click' AND e.tms - v.t0 < 604800000
      |      GROUP BY 1, 2, 3),
      |p AS (SELECT c.user_id, c.s0, c.t0, MIN(e.seq) AS p_seq
      |      FROM c JOIN ev e ON e.user_id = c.user_id AND e.seq > c.c_seq
      |        AND e.ty = 'purchase' AND e.tms - c.t0 < 604800000
      |      GROUP BY 1, 2, 3)
      |SELECT p.user_id,
      |       CAST(row_number() OVER (PARTITION BY p.user_id ORDER BY p.s0) AS INT)
      |         AS match_n,
      |       p.t0 AS start_tms, pe.tms AS end_tms
      |FROM p JOIN ev pe ON pe.user_id = p.user_id AND pe.seq = p.p_seq
      |ORDER BY p.user_id, match_n""".stripMargin


  // the q_cep_consec closed-flag automaton oracle, shared with
  // q_cep_consec_stream.
  private val cepConsecSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events)),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS c, FALSE AS cl,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT user_id, seq,
        |    CASE WHEN ec = 0 AND ty = 'view' THEN 1
        |         WHEN ec = 0 THEN 0
        |         WHEN ty = 'view' AND NOT ecl THEN ec + 1
        |         WHEN ec >= 2 AND ty = 'purchase' THEN 0
        |         WHEN ec < 2 THEN 0
        |         ELSE ec END,
        |    CASE WHEN ty = 'view' AND ec >= 1 AND NOT ecl THEN FALSE
        |         WHEN ec >= 2 AND ty = 'purchase' THEN FALSE
        |         WHEN ec >= 2 THEN TRUE
        |         ELSE FALSE END,
        |    CASE WHEN ec = 0 AND ty = 'view' THEN etms
        |         WHEN ec = 0 THEN CAST(0 AS BIGINT)
        |         WHEN ty = 'view' AND NOT ecl THEN et0
        |         WHEN ec >= 2 AND ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         WHEN ec < 2 THEN CAST(0 AS BIGINT)
        |         ELSE et0 END,
        |    CASE WHEN ec >= 2 AND ty = 'purchase' THEN et0 END,
        |    CASE WHEN ec >= 2 AND ty = 'purchase' THEN etms END
        |  FROM (
        |    SELECT r.user_id, e.seq, e.ty, e.tms AS etms,
        |      CASE WHEN r.c > 0 AND e.tms - r.t0 >= 604800000
        |           THEN 0 ELSE r.c END AS ec,
        |      CASE WHEN r.c > 0 AND e.tms - r.t0 >= 604800000
        |           THEN FALSE ELSE r.cl END AS ecl,
        |      CASE WHEN r.c > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CAST(0 AS BIGINT) ELSE r.t0 END AS et0
        |    FROM run r JOIN ev e
        |      ON e.user_id = r.user_id AND e.seq = r.seq + 1))
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY m_s, m_e)
        |         AS INT) AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin


  // the q_cep_skipto rewind-position automaton oracle, shared with
  // q_cep_skipto_stream.
  private val cepSkipToSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(1 AS BIGINT) AS pos, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0, CAST(0 AS BIGINT) AS bpos,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT user_id,
        |    CASE WHEN emit THEN bpos2 ELSE pos + 1 END,
        |    CASE WHEN emit THEN 0 WHEN mt THEN est + 1 ELSE est END,
        |    CASE WHEN emit THEN CAST(0 AS BIGINT)
        |         WHEN mt AND est = 0 THEN etms ELSE et0 END,
        |    CASE WHEN emit THEN CAST(0 AS BIGINT) ELSE bpos2 END,
        |    CASE WHEN emit THEN et0 END,
        |    CASE WHEN emit THEN etms END
        |  FROM (
        |    SELECT *,
        |      (est = 0 AND ty = 'view') OR (est = 1 AND ty = 'click')
        |        OR (est = 2 AND ty = 'purchase') AS mt,
        |      est = 2 AND ty = 'purchase' AS emit,
        |      CASE WHEN est = 1 AND ty = 'click' THEN eseq ELSE ebp END AS bpos2
        |    FROM (
        |      SELECT r.user_id, r.pos, e.tms AS etms, e.seq AS eseq, e.ty,
        |        CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |             THEN 0 ELSE r.st END AS est,
        |        CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |             THEN CAST(0 AS BIGINT) ELSE r.t0 END AS et0,
        |        CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |             THEN CAST(0 AS BIGINT) ELSE r.bpos END AS ebp
        |      FROM run r JOIN ev e
        |        ON e.user_id = r.user_id AND e.seq = r.pos)))
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY m_s, m_e)
        |         AS INT) AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin

  // the q_cep batch automaton oracle, shared with q_cep_stream
  /** Recursive-CTE twin of the one-event-per-stage automaton for an
    * ARBITRARY stage list — `cepSql`'s hand-written three-stage table,
    * generated: same branch order (timeout, advance, emit, hold), same
    * skip-past-last-row reset. `q_cep_group` feeds it the group pattern
    * UNROLLED (exact-count group times ≡ concatenated stages — the
    * Flink NFA compiler's own expansion). */
  private def cepUnrolledSql(stages: Seq[String], w: Long): String = {
    require(stages.length >= 2)
    val types = stages.distinct.map(t => s"'$t'").mkString(", ")
    val last = stages.length - 1
    val adv = (0 until last)
      .map(i => s"(r.st = $i AND e.ty = '${stages(i)}')").mkString(" OR ")
    s"""WITH RECURSIVE ev AS (
       |  SELECT user_id, tms, ty,
       |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
       |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
       |               event_type AS ty
       |        FROM events WHERE event_type IN ($types))),
       |run AS (
       |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
       |         CAST(0 AS BIGINT) AS t0,
       |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
       |  FROM (SELECT DISTINCT user_id FROM ev)
       |  UNION ALL
       |  SELECT r.user_id, e.seq,
       |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= $w
       |           THEN CASE WHEN e.ty = '${stages.head}' THEN 1 ELSE 0 END
       |         WHEN $adv THEN r.st + 1
       |         WHEN r.st = $last AND e.ty = '${stages.last}' THEN 0
       |         ELSE r.st END AS st,
       |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= $w
       |           THEN CASE WHEN e.ty = '${stages.head}' THEN e.tms ELSE CAST(0 AS BIGINT) END
       |         WHEN r.st = 0 AND e.ty = '${stages.head}' THEN e.tms
       |         WHEN r.st = $last AND e.ty = '${stages.last}' THEN CAST(0 AS BIGINT)
       |         ELSE r.t0 END AS t0,
       |    CASE WHEN r.st = $last AND e.ty = '${stages.last}' AND e.tms - r.t0 < $w
       |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
       |    CASE WHEN r.st = $last AND e.ty = '${stages.last}' AND e.tms - r.t0 < $w
       |           THEN e.tms ELSE CAST(NULL AS BIGINT) END AS m_e
       |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
       |SELECT user_id,
       |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
       |         AS match_n,
       |       m_s AS start_tms, m_e AS end_tms
       |FROM run WHERE m_s IS NOT NULL
       |ORDER BY user_id, match_n""".stripMargin
  }

  private val cepSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN (r.st = 0 AND e.ty = 'view') OR (r.st = 1 AND e.ty = 'click')
        |           THEN r.st + 1
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN e.tms ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin

  // the q_cep_iter batch automaton oracle, shared with
  // q_cep_iter_stream: (st, t0, v0) state where v0 is the opening
  // view's captured value, compared as 2*v0 exactly as the fold's
  // rewritten predicate does
  private val cepIterSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty, value
        |        FROM events WHERE event_type IN ('view', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0, CAST(0 AS DOUBLE) AS v0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN 1
        |         WHEN r.st = 1 AND e.ty = 'purchase' AND e.value > 2 * r.v0
        |           THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 1 AND e.ty = 'purchase' AND e.value > 2 * r.v0
        |           THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.value ELSE CAST(0 AS DOUBLE) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.value
        |         WHEN r.st = 1 AND e.ty = 'purchase' AND e.value > 2 * r.v0
        |           THEN CAST(0 AS DOUBLE)
        |         ELSE r.v0 END AS v0,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 604800000
        |              AND e.ty = 'purchase' AND e.value > 2 * r.v0 THEN r.t0
        |         ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 604800000
        |              AND e.ty = 'purchase' AND e.value > 2 * r.v0 THEN e.tms
        |         ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin

  // the q_cep_select per-stage-capture automaton oracle, shared with
  // q_cep_select_stream (foldBatchSelect is the same step seeded from
  // storage, es capture included, so time-cut folds concatenate to the
  // batch operator)
  private val cepSelSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, oid, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS e1_t, CAST(NULL AS BIGINT) AS e1_o,
        |         CAST(NULL AS BIGINT) AS e2_t, CAST(NULL AS BIGINT) AS e2_o,
        |         CAST(NULL AS BIGINT) AS m1_t, CAST(NULL AS BIGINT) AS m1_o,
        |         CAST(NULL AS BIGINT) AS m2_t, CAST(NULL AS BIGINT) AS m2_o,
        |         CAST(NULL AS BIGINT) AS m3_t, CAST(NULL AS BIGINT) AS m3_o
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN (r.st = 0 AND e.ty = 'view') OR (r.st = 1 AND e.ty = 'click')
        |           THEN r.st + 1
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(NULL AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(NULL AS BIGINT)
        |         ELSE r.e1_t END AS e1_t,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.oid ELSE CAST(NULL AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.oid
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(NULL AS BIGINT)
        |         ELSE r.e1_o END AS e1_o,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CAST(NULL AS BIGINT)
        |         WHEN r.st = 1 AND e.ty = 'click' THEN e.tms
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(NULL AS BIGINT)
        |         ELSE r.e2_t END AS e2_t,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CAST(NULL AS BIGINT)
        |         WHEN r.st = 1 AND e.ty = 'click' THEN e.oid
        |         WHEN r.st = 2 AND e.ty = 'purchase' THEN CAST(NULL AS BIGINT)
        |         ELSE r.e2_o END AS e2_o,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.e1_t ELSE CAST(NULL AS BIGINT) END AS m1_t,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.e1_o ELSE CAST(NULL AS BIGINT) END AS m1_o,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.e2_t ELSE CAST(NULL AS BIGINT) END AS m2_t,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.e2_o ELSE CAST(NULL AS BIGINT) END AS m2_o,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN e.tms ELSE CAST(NULL AS BIGINT) END AS m3_t,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN e.oid ELSE CAST(NULL AS BIGINT) END AS m3_o
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1),
        |numbered AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |           AS match_n,
        |         m1_t, m1_o, m2_t, m2_o, m3_t, m3_o
        |  FROM run WHERE m1_t IS NOT NULL)
        |SELECT user_id, match_n, stage_n, ev_tms, ev_oid FROM (
        |  SELECT user_id, match_n, CAST(1 AS INT) AS stage_n,
        |         m1_t AS ev_tms, m1_o AS ev_oid FROM numbered
        |  UNION ALL
        |  SELECT user_id, match_n, CAST(2 AS INT), m2_t, m2_o FROM numbered
        |  UNION ALL
        |  SELECT user_id, match_n, CAST(3 AS INT), m3_t, m3_o FROM numbered)
        |ORDER BY user_id, match_n, stage_n""".stripMargin

  // the q_cep_next strict-contiguity oracle, shared with
  // q_cep_next_stream (foldBatchNext seeds the same step from storage)
  private val cepNextSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events)),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 >= 86400000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN 1
        |         WHEN r.st = 1 AND e.ty = 'click' THEN 0
        |         WHEN r.st = 1
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 >= 86400000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 1 AND e.ty = 'click' THEN CAST(0 AS BIGINT)
        |         WHEN r.st = 1
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 86400000 AND e.ty = 'click'
        |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 86400000 AND e.ty = 'click'
        |           THEN e.tms ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin

  // the q_cep_neg negation oracle (incl. final-state flush), shared
  // with q_cep_neg_stream (3 folds + flushBatchNeg past everything)
  private val cepNegSql: String =
    """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events
        |        WHERE event_type IN ('view', 'purchase', 'error', 'click'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0, CAST(0 AS BIGINT) AS te,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st = 2 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.st = 2 AND e.ty = 'click' THEN 0
        |         WHEN r.st = 2 THEN 2
        |         WHEN r.st = 1 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.st = 1 AND e.ty = 'error' THEN 0
        |         WHEN r.st = 0 AND e.ty = 'view' THEN 1
        |         WHEN r.st = 1 AND e.ty = 'purchase' THEN 2
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st = 2 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 2 AND e.ty = 'click' THEN CAST(0 AS BIGINT)
        |         WHEN r.st = 2 THEN r.t0
        |         WHEN r.st = 1 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 1 AND e.ty = 'error' THEN CAST(0 AS BIGINT)
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 259200000
        |              AND e.ty = 'purchase' THEN e.tms
        |         WHEN r.st = 2 AND e.tms - r.t0 < 259200000
        |              AND e.ty <> 'click' THEN r.te
        |         ELSE CAST(0 AS BIGINT) END AS te,
        |    CASE WHEN r.st = 2 AND e.tms - r.t0 >= 259200000
        |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 2 AND e.tms - r.t0 >= 259200000
        |           THEN r.te ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1),
        |fin AS (
        |  SELECT user_id, seq, st, t0, te,
        |         row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
        |  FROM run),
        |emits AS (
        |  SELECT user_id, seq, m_s, m_e FROM run WHERE m_s IS NOT NULL
        |  UNION ALL
        |  SELECT user_id, seq + 1, t0, te FROM fin WHERE rn = 1 AND st = 2)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM emits
        |ORDER BY user_id, match_n""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_topk_sku" ->
      s"""WITH $odCte,
         |agged AS (
         |  SELECT (ts // 86400) * 86400 AS ws, sku_id,
         |         CAST(SUM(CAST(split_total_amount AS DECIMAL(18,6))) AS DOUBLE) AS amount
         |  FROM od GROUP BY 1, 2)
         |SELECT ws, rk, sku_id, amount FROM (
         |  SELECT ws, sku_id, amount,
         |         row_number() OVER (PARTITION BY ws ORDER BY amount DESC, sku_id) AS rk
         |  FROM agged)
         |WHERE rk <= 3 ORDER BY ws, rk""".stripMargin,

    "q_session_window" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
        |marked AS (
        |  SELECT user_id,
        |         CASE WHEN lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) IS NULL
        |                OR ts_ms - lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) >= 1800000
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM ev)
        |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS session_ct, COUNT(*) AS event_ct
        |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_dws_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ms(ts) // 1000 AS ts_s FROM events),
        |hopped AS (
        |  SELECT event_type,
        |         unnest([ (ts_s // 1800) * 1800, (ts_s // 1800) * 1800 - 1800 ]) AS ws
        |  FROM ev)
        |SELECT ws, event_type, COUNT(*) AS pv
        |FROM hopped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // floor-remainder (tms − (tms//size)·size), not `%`: DuckDB's % is
    // sign-of-dividend while // floors — mixing them breaks on pre-epoch
    // timestamps exactly where the Spark side now floors correctly
    "q_cumulate" ->
      """WITH ev AS (SELECT epoch_ms(ts) AS tms, user_id FROM events),
        |x AS (SELECT (tms // 86400000) * 86400 AS ws,
        |             (tms // 86400000) * 86400 + k * 21600 AS bound, user_id
        |      FROM ev, (SELECT UNNEST(range(1, 5)) AS k) ks
        |      WHERE k >= (tms - (tms // 86400000) * 86400000) // 21600000 + 1)
        |SELECT ws, bound, COUNT(*) AS ev_ct, COUNT(DISTINCT user_id) AS uv
        |FROM x GROUP BY 1, 2 ORDER BY ws, bound""".stripMargin,

    "q_rollup_province" ->
      s"""WITH $oiCte
         |SELECT province_id, strftime(make_timestamp(order_ts * 1000000), '%Y-%m') AS mon,
         |       COUNT(*) AS order_ct
         |FROM oi GROUP BY ROLLUP (province_id, mon)
         |ORDER BY province_id NULLS FIRST, mon NULLS FIRST""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS tms FROM events),
        |v AS (SELECT user_id, MIN(tms) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT ev.user_id, MIN(tms) AS t_click FROM ev JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND tms > t_view GROUP BY 1),
        |p AS (SELECT ev.user_id, MIN(tms) AS t_buy FROM ev JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND tms > t_click GROUP BY 1)
        |SELECT stage, users FROM (
        |  SELECT '1_view' AS stage, COUNT(*) AS users FROM v
        |  UNION ALL SELECT '2_click_after_view', COUNT(*) FROM c
        |  UNION ALL SELECT '3_purchase_after_click', COUNT(*) FROM p)
        |ORDER BY stage""".stripMargin,

    "q_retention" ->
      """WITH ev AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_n, COUNT(DISTINCT ev.user_id) AS users
        |FROM ev JOIN f USING (user_id)
        |WHERE day - cohort_day <= 7
        |GROUP BY 1, 2 ORDER BY cohort_day, day_n""".stripMargin,

    "q_journey" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS tms FROM events),
        |marked AS (
        |  SELECT user_id, event_id, event_type, tms,
        |         CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id)
        |                IS NULL
        |              OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms, event_id)
        |                >= 1800000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, event_id, event_type, tms,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(tms) AS sess_start, COUNT(*) AS ev_ct,
        |       string_agg(event_type, '>' ORDER BY tms, event_id) AS path
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,

    "q_resample" ->
      """WITH ev0 AS (
        |  SELECT user_id, epoch_ms(ts) AS tms, value, event_id FROM events),
        |ev AS (
        |  SELECT user_id, tms, value FROM (
        |    SELECT user_id, tms, value,
        |           row_number() OVER (PARTITION BY user_id, tms
        |             ORDER BY event_id DESC) AS rk
        |    FROM ev0) WHERE rk = 1),
        |b AS (
        |  SELECT user_id,
        |         MIN(tms) + (((-MIN(tms)) % 3600000) + 3600000) % 3600000 AS lo,
        |         MAX(tms) - (((MAX(tms)) % 3600000) + 3600000) % 3600000 AS hi
        |  FROM ev GROUP BY 1),
        |g AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 3600000)) AS tms
        |  FROM b WHERE lo <= hi)
        |SELECT g.user_id, g.tms, ev.value
        |FROM g ASOF LEFT JOIN ev ON g.user_id = ev.user_id AND g.tms >= ev.tms
        |ORDER BY g.user_id, g.tms""".stripMargin,

    // Recursive-CTE automaton: one iteration per per-user sequence position
    // (depth = the busiest user's pattern-event count, ~65 at any SF — the
    // per-key bound the Spark fold shares). State mirrors ops/Cep.scala
    // branch for branch: timeout first, then stage advance, else hold.
    "q_cep" -> cepSql,

    // q_cep_stream shares the batch oracle VERBATIM: IncrementalCep's fold
    // is the batch step function seeded from storage, so three time-cut
    // folds concatenate to exactly the batch automaton's matches.
    "q_cep_stream" -> cepSql,

    // group pattern = the generic CTE on the UNROLLED stage list (the
    // operator's own delegation, independently re-derived in SQL)
    "q_cep_group" -> cepUnrolledSql(
      Seq("view", "click", "view", "click"), 604800000L),

    // branching NFA on (view)(click opt)(click) ≡ the two-stage
    // view→click machine (see the query comment for the reduction)
    "q_cep_nfa" -> cepUnrolledSql(Seq("view", "click"), 604800000L),

    // the store drives share the batch oracles VERBATIM: the folds are
    // the batch step functions seeded from storage
    "q_cep_group_stream" -> cepUnrolledSql(
      Seq("view", "click", "view", "click"), 604800000L),
    "q_cep_nfa_stream" -> cepUnrolledSql(Seq("view", "click"), 604800000L),


    // The q_cep automaton with per-stage event captures: (e1, e2) hold the
    // matched view/click (tms, oid) while the run is live; the purchase
    // branch emits all three stages' events, unrolled to long format.
    // Branch order mirrors cepSql exactly (timeout, advance, emit, hold).
    "q_cep_select" -> cepSelSql,

    "q_cep_select_stream" -> cepSelSql,


    // The strict-contiguity automaton over the UNFILTERED event sequence
    // (any intervening event breaks adjacency), branch order mirrored:
    // timeout, stage advances, strict break (the breaking view reopens).
    "q_cep_next" -> cepNextSql,

    "q_cep_next_stream" -> cepNextSql,

    // The notNext automaton over the UNFILTERED event sequence: the
    // fresh-slot flag (fr) marks "view just matched, next event decides";
    // an error there kills, anything else discharges the ban (fr drops to
    // false) and the run keeps waiting relaxed for the purchase.
    "q_cep_notnext" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events)),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0, false AS fr,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.fr AND r.st = 1 AND e.ty = 'error' THEN 0
        |         WHEN r.st = 0 AND e.ty = 'view' THEN 1
        |         WHEN r.st = 1 AND e.ty = 'purchase' THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 259200000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.fr AND r.st = 1 AND e.ty = 'error' THEN CAST(0 AS BIGINT)
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st = 1 AND e.ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 259200000
        |           THEN e.ty = 'view'
        |         WHEN r.fr AND r.st = 1 AND e.ty = 'error' THEN false
        |         WHEN r.st = 0 AND e.ty = 'view' THEN true
        |         WHEN r.st = 1 AND e.ty = 'purchase' THEN false
        |         ELSE false END AS fr,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 259200000
        |              AND e.ty = 'purchase' THEN r.t0
        |         ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 1 AND e.tms - r.t0 < 259200000
        |              AND e.ty = 'purchase' THEN e.tms
        |         ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin,

    // The quantified automaton as a recursive CTE over (c, t0): c counts
    // consecutive-stage views (the greedy unbounded loop), a purchase with
    // c >= 3 emits. Branch order mirrors ops/Cep.patternMatchesTimes:
    // timeout first (the abandoning view re-opens at c = 1), then the
    // unified open/extend view branch, then the advance-emit.
    "q_cep_times" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('view', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS c,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.c > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN e.ty = 'view' THEN r.c + 1
        |         WHEN r.c >= 3 AND e.ty = 'purchase' THEN 0
        |         ELSE r.c END AS c,
        |    CASE WHEN r.c > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.c = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.c >= 3 AND e.ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.c >= 3 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.c >= 3 AND e.ty = 'purchase' AND e.tms - r.t0 < 604800000
        |           THEN e.tms ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin,

    // The until-closed loop automaton: state (c, t0, te); branch order
    // mirrors UntilStepper — timeout/idle/stop-event all route through
    // the reset group (a click re-opens, anything else idles), a live
    // click extends and stamps te, and the in-window purchase with
    // c >= 2 emits (t0, te) — the purchase itself is NOT in the match.
    "q_cep_until" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS c,
        |         CAST(0 AS BIGINT) AS t0, CAST(0 AS BIGINT) AS te,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN (r.c > 0 AND e.tms - r.t0 >= 604800000) OR r.c = 0
        |              OR e.ty = 'purchase'
        |           THEN CASE WHEN e.ty = 'click' THEN 1 ELSE 0 END
        |         ELSE r.c + 1 END AS c,
        |    CASE WHEN (r.c > 0 AND e.tms - r.t0 >= 604800000) OR r.c = 0
        |              OR e.ty = 'purchase'
        |           THEN CASE WHEN e.ty = 'click' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN (r.c > 0 AND e.tms - r.t0 >= 604800000) OR r.c = 0
        |              OR e.ty = 'purchase'
        |           THEN CASE WHEN e.ty = 'click' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         ELSE e.tms END AS te,
        |    CASE WHEN e.ty = 'purchase' AND r.c >= 2
        |              AND e.tms - r.t0 < 604800000
        |           THEN r.t0 ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN e.ty = 'purchase' AND r.c >= 2
        |              AND e.tms - r.t0 < 604800000
        |           THEN r.te ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin,

    // SKIP TO NEXT ROW: runs never interact (monotone NFA runs for a fixed
    // sequential pattern), so the oracle is a static per-stage unroll —
    // each view's earliest in-window click, then that click's earliest
    // in-window purchase.
    "q_cep_skipnext" -> cepSkipSql,

    // The consecutive-loop automaton over the UNFILTERED event sequence
    // (any event can break the view run): state (c, cl, t0) — the
    // stage-1 purchase emits immediately (exact count 1), so st never
    // materializes. Branch order mirrors ConsecStepper: timeout, idle/
    // open, extend (not closed), emit, break-below-floor dies (the
    // breaking event cannot be a view there — a view would have
    // extended), break-at/above-floor closes.
    "q_cep_consec" -> cepConsecSql,

    // q_cep_consec_stream shares the batch oracle VERBATIM:
    // foldBatchConsec seeds the same ConsecStepper from storage, so
    // three time-cut folds concatenate to the batch operator.
    "q_cep_consec_stream" -> cepConsecSql,

    // The skip-to-first/last automaton as a REWIND-POSITION recursive
    // CTE: one row per key per processing step over (pos, st, t0, bpos);
    // a completed match jumps pos back to bpos (the stage-1 click's seq,
    // recorded when stage 1 matched) — the SkipToRunner's replay as
    // positional recursion. Starts strictly increase per key, so
    // ORDER BY m_s is emission order.
    "q_cep_skipto" -> cepSkipToSql,

    // q_cep_skipto_stream shares the batch oracle VERBATIM:
    // foldBatchSkipTo seeds the same SkipToRunner (state + rewind
    // buffer) from storage.
    "q_cep_skipto_stream" -> cepSkipToSql,

    // q_cep_skipnext_stream shares the batch oracle VERBATIM:
    // foldBatchSkipNext runs the same SkipStepper with the run set
    // seeded from storage, so three time-cut folds concatenate to
    // exactly the batch operator's matches.
    "q_cep_skipnext_stream" -> cepSkipSql,

    // The optional-stage automaton as a recursive CTE over (st, t0):
    // st 0 idle, 1 = view seen, 2 = in the optional click loop; a
    // purchase at st >= 1 emits — the skip branch is exactly "purchase
    // completes from st = 1". Branch order mirrors the fold: timeout,
    // open, loop, emit.
    "q_cep_opt" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty
        |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN 1 ELSE 0 END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN 1
        |         WHEN r.st >= 1 AND e.ty = 'click' THEN 2
        |         WHEN r.st >= 1 AND e.ty = 'purchase' THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' THEN e.tms
        |         WHEN r.st >= 1 AND e.ty = 'purchase' THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st >= 1 AND e.ty = 'purchase'
        |              AND e.tms - r.t0 < 604800000 THEN r.t0
        |         ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st >= 1 AND e.ty = 'purchase'
        |              AND e.tms - r.t0 < 604800000 THEN e.tms
        |         ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin,

    // The iterative-condition automaton: (st, t0, v0) state where v0 is
    // the opening view's captured value; the purchase branch compares
    // against 2*v0 exactly as the fold's rewritten predicate does.
    "q_cep_iter" -> cepIterSql,

    // q_cep_iter_stream shares the batch oracle VERBATIM (the
    // q_cep_stream precedent): foldBatchIter is the batch step function
    // seeded from storage, f0 capture included, so three time-cut folds
    // concatenate to exactly the batch automaton's matches.
    "q_cep_iter_stream" -> cepIterSql,



    // The predicate-stage automaton as a recursive CTE: branch-for-branch
    // q_cep's (st, t0) state with where()-conditions in place of type
    // tests (value comparisons only — no float arithmetic, portable).
    "q_cep_where" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, tms, ty, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY tms, oid, ty) AS seq
        |  FROM (SELECT user_id, epoch_ms(ts) AS tms, event_id AS oid,
        |               event_type AS ty, value
        |        FROM events WHERE event_type IN ('view', 'click', 'purchase'))),
        |run AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS seq, 0 AS st,
        |         CAST(0 AS BIGINT) AS t0,
        |         CAST(NULL AS BIGINT) AS m_s, CAST(NULL AS BIGINT) AS m_e
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, e.seq,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' AND e.value > 60.0 THEN 1 ELSE 0 END
        |         WHEN (r.st = 0 AND e.ty = 'view' AND e.value > 60.0)
        |              OR (r.st = 1 AND e.ty = 'click')
        |           THEN r.st + 1
        |         WHEN r.st = 2 AND e.ty = 'purchase' AND e.value > 120.0 THEN 0
        |         ELSE r.st END AS st,
        |    CASE WHEN r.st > 0 AND e.tms - r.t0 >= 604800000
        |           THEN CASE WHEN e.ty = 'view' AND e.value > 60.0
        |                     THEN e.tms ELSE CAST(0 AS BIGINT) END
        |         WHEN r.st = 0 AND e.ty = 'view' AND e.value > 60.0 THEN e.tms
        |         WHEN r.st = 2 AND e.ty = 'purchase' AND e.value > 120.0
        |           THEN CAST(0 AS BIGINT)
        |         ELSE r.t0 END AS t0,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.value > 120.0
        |              AND e.tms - r.t0 < 604800000 THEN r.t0
        |         ELSE CAST(NULL AS BIGINT) END AS m_s,
        |    CASE WHEN r.st = 2 AND e.ty = 'purchase' AND e.value > 120.0
        |              AND e.tms - r.t0 < 604800000 THEN e.tms
        |         ELSE CAST(NULL AS BIGINT) END AS m_e
        |  FROM run r JOIN ev e ON e.user_id = r.user_id AND e.seq = r.seq + 1)
        |SELECT user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY seq) AS INT)
        |         AS match_n,
        |       m_s AS start_tms, m_e AS end_tms
        |FROM run WHERE m_s IS NOT NULL
        |ORDER BY user_id, match_n""".stripMargin,

    // The negation automaton (states: 0 idle, 1 = view seen / waiting for
    // purchase with error banned, 2 = WATCHING the trailing click ban),
    // mirrored branch for branch: watch-expiry first (emits), then bans,
    // then stage advances; the final per-user state flushes a still-open
    // watch (input end = the banned event never came).
    "q_cep_neg" -> cepNegSql,

    "q_cep_neg_stream" -> cepNegSql)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Complex-event-processing pattern matching — the Flink-CEP operator class
  * the reference platform's stack ships as a first-class library
  * (flink-cep; the reference's DWD layer mines the same event streams with
  * hand-rolled joins, e.g. the funnel shape in `q_funnel`). This is the
  * general form: an ordered event pattern per key, matched with Flink's
  * `followedBy` (relaxed-contiguity) semantics, a `within` time bound, and
  * AFTER MATCH SKIP PAST LAST ROW.
  *
  * Automaton, applied to each key's events in (ts, ord) order:
  *   - a partial match whose next event arrives more than `withinMs` after
  *     the partial's first event is abandoned (the abandoning event may
  *     itself start a new partial if it matches stage 0);
  *   - an event equal to the next expected stage advances the partial
  *     (stage 0 stamps the match start); completing the last stage emits
  *     (start, end) and resets — matches never overlap (skip past last row);
  *   - every other event is ignored (relaxed contiguity).
  *
  * Scale shape: the corpus-scale scan is pre-filtered to the pattern's own
  * event types (a pushable `IN` predicate — non-pattern events provably
  * never change automaton state), then ONE hash shuffle on the key and a
  * ROW-LOCAL `aggregate` fold over each key's sorted pattern-events. Per-key
  * memory is that key's pattern-event count — exactly the footprint Flink's
  * keyed CEP state holds; there is no cross-key anything, so 1000 executors
  * partition cleanly on the key. The fold is an expression tree (no UDF);
  * its SQL twin is a recursive-CTE automaton over the same (st, t0) state
  * (NOT `list_reduce` — see the round-7 `wordpieceCounts` lesson), so
  * `q_cep` hash-matches by construction.
  *
  * Streaming twin: [[graft.streaming.CepStream]] runs the same automaton as
  * `flatMapGroupsWithState` keyed state; parity pinned by `CepStreamSpec`.
  */
object Cep {

  private def esc(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Matches of `pattern` (ordered event-type names, length ≥ 1, repeats
    * allowed) per key, within `withinMs` of the match's first event.
    *
    * @param ordCol  deterministic tie-break within equal timestamps
    * @return (k, match_n, start_tms, end_tms) — one row per match, match_n
    *         numbered 1.. per key in time order; keys with no match absent */
  def patternMatches(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val last = pattern.length - 1
    // boolean: does event e match the stage acc.st expects?
    val stageMatch = pattern.zipWithIndex
      .map { case (t, i) => s"WHEN acc.st = $i THEN e.ty = ${esc(t)}" }
      .mkString("CASE ", " ", " ELSE false END")
    val start = "IF(acc.st = 0, e.tms, acc.t0)"
    val emit = s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), " +
      s"'ms', array_append(acc.ms, named_struct('s', $start, 'e', e.tms)))"
    val advance = s"CASE WHEN acc.st = $last THEN $emit " +
      s"ELSE named_struct('st', acc.st + 1, 't0', $start, 'ms', acc.ms) END"
    // timeout: drop the partial, then let the SAME event open a new one if
    // it is a stage-0 event (with P = 1 this branch is unreachable: st is
    // always 0 between events)
    val afterTimeout = s"IF(e.ty = ${esc(pattern.head)}, " +
      s"named_struct('st', 1, 't0', e.tms, 'ms', acc.ms), " +
      s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), 'ms', acc.ms))"
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 't0', CAST(0 AS BIGINT),
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      (acc, e) -> CASE
        WHEN acc.st > 0 AND e.tms - acc.t0 > $withinMs THEN $afterTimeout
        WHEN $stageMatch THEN $advance
        ELSE acc END,
      acc -> acc.ms)"""
    df.filter(typeCol.isin(pattern.distinct: _*))
      .select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
        ordCol.cast("long").as("oid"), typeCol.as("ty"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("tms"), col("oid"), col("ty"))))
        .as("evs"))
      .select(col("k"), posexplode(expr(fold)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }
}

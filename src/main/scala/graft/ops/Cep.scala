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
  *   - a partial match whose next event arrives `withinMs` OR MORE after
  *     the partial's first event is abandoned — Flink's NFA times out at
  *     `timestamp - startTimestamp >= windowTime`, so a run whose span
  *     exactly equals the window does NOT complete (the abandoning event
  *     may itself start a new partial if it matches stage 0);
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

  /** SQL string-literal escaping for event-type constants — shared with
    * [[graft.streaming.IncrementalCep]] so the two can't drift. */
  private[graft] def esc(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Apply `f` to the segments of `sql` OUTSIDE string literals (backslash
    * escapes and doubled quotes respected). Spark's default lexer accepts
    * BOTH single- and double-quoted string literals
    * (`spark.sql.ansi.doubleQuotedIdentifiers` is off), so both quote
    * styles are masked. The `first.` rewrite/detection must not touch a
    * literal like `'first.home'` or `"first.home"` — a plain regex over
    * the whole predicate would silently rewrite it to `'acc.f0.home'` and
    * change match results. */
  private[graft] def mapOutsideLiterals(sql: String)(f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var i = 0
    var lit: Char = 0 // 0 = outside a literal; else the opening quote char
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (lit == 0) {
        if (c == '\'' || c == '"') {
          out.append(f(seg.toString)); seg.clear(); out.append(c); lit = c
        } else seg.append(c)
      } else {
        out.append(c)
        if (c == '\\' && i + 1 < sql.length) { out.append(sql.charAt(i + 1)); i += 1 }
        else if (c == lit) {
          if (i + 1 < sql.length && sql.charAt(i + 1) == lit) {
            out.append(lit); i += 1
          } else lit = 0
        }
      }
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  /** True iff `re` matches some NON-LITERAL segment of `sql` (see
    * [[mapOutsideLiterals]]) — the stage-0 `first.` rejection must not
    * false-positive on a string literal containing the token. */
  private[graft] def existsOutsideLiterals(sql: String, re: String): Boolean = {
    var found = false
    mapOutsideLiterals(sql) { seg => if (seg.matches(re)) found = true; seg }
    found
  }

  /** Typed event row of the SORTED-ITERATOR automaton plans, generic in
    * the key type (`Option[Long]` serves every integral key null-safely —
    * a NULL key groups as `None`, matching the SQL fold's `GROUP BY`
    * null-group semantics; `String` serves string keys directly). */
  private[graft] final case class CepEvK[K](k: K, tms: Long, oid: Long,
      ty: String)
  /** [[CepEvK]] for the PRECOMPUTED-PREDICATE plan: `ps(i)` is stage i's
    * predicate evaluated on this event (see [[patternMatchesWhere]]). */
  private[graft] final case class CepEvPK[K](k: K, tms: Long, oid: Long,
      ps: Array[Boolean])
  private[graft] final case class CepMatchK[K](k: K, match_n: Int,
      start_tms: Long, end_tms: Long)
  private[graft] final case class CepSelK[K](k: K, match_n: Int,
      stage_n: Int, ev_tms: Long, ev_oid: Long)

  /** The quantified automaton's step semantics as a row-at-a-time Scala
    * stepper — the THIRD expression of the same branch structure as
    * [[timesFoldStepPred]] (SQL) and the recursive-CTE oracles, shared by
    * the batch sorted-iterator plan ([[TypedCep.times]]) and every
    * [[graft.streaming.CepStream]] group function, so the typed paths
    * cannot drift from each other. Predicates are arbitrary `E => Boolean`
    * (type equality is the [[patternMatchesTimes]] case); `emit` fires
    * with (start, end) on every completed match. State is the same
    * (stage, count, start) triple the SQL fold and the persistent
    * [[graft.streaming.IncrementalCep]] layout hold. */
  private[graft] final class TimesStepper[E](
      pattern: IndexedSeq[(E => Boolean, Int, Int)], withinMs: Long,
      tmsOf: E => Long, onOpen: E => Unit = (_: E) => ()) {
    private val last = pattern.length - 1

    /** One event: (st, c, t0) -> new (st, c, t0); emit on completion;
      * `onOpen` fires with the event that OPENS stage 0 (the iterative-
      * condition capture point — first loop event only, re-fired on a
      * post-timeout re-open, exactly the SQL fold's `capF0` site). */
    def step(st: Int, c: Int, t0: Long, e: E,
        emit: (Long, Long) => Unit): (Int, Int, Long) = {
      val tms = tmsOf(e)
      // opening stage 0 on e (fresh, post-timeout, post-emit) —
      // single-stage min-1 patterns emit instantly (the fold's enter0)
      def enter0: (Int, Int, Long) =
        if (pattern.head._1(e)) {
          onOpen(e)
          if (last == 0 && pattern.head._2 == 1) { emit(tms, tms); (0, 0, 0L) }
          else (0, 1, tms)
        } else (0, 0, 0L)
      if (c > 0 && tms - t0 >= withinMs) enter0
      else if (c == 0) enter0
      else {
        val (p, mn, mx) = pattern(st)
        if (p(e) && (mx == Unbounded || c < mx)) {
          // greedy extend wins over advance while the loop can accept
          if (st == last && c + 1 == mn) { emit(t0, tms); (0, 0, 0L) }
          else (st, c + 1, t0)
        } else if (st < last && c >= mn) {
          // advance targets: next stage + stages reachable by skipping
          // optional (min-0) stages; ascending = greedy prefers matching
          // an optional stage over skipping it (the SQL fold's order)
          ((st + 1) to last).view
            .takeWhile(j => (st + 1 until j).forall(pattern(_)._2 == 0))
            .find(j => pattern(j)._1(e)) match {
            case Some(j) =>
              if (j == last && pattern(j)._2 == 1) { emit(t0, tms); (0, 0, 0L) }
              else (j, 1, t0)
            case None => (st, c, t0)
          }
        } else (st, c, t0)
      }
    }
  }

  /** The MATCH-PAYLOAD automaton's step semantics — the plain
    * one-event-per-stage automaton ([[patternMatches]]' branch structure
    * exactly) with the partial's matched (tms, oid) per stage buffered in
    * a caller-owned O(pattern) buffer; `emit` receives the completed
    * per-stage list. Shared by [[patternMatchesSelect]] and
    * [[graft.streaming.CepStream.matchGroupSelect]]. */
  private[graft] final class SelectStepper(pattern: IndexedSeq[String],
      withinMs: Long) {
    private val last = pattern.length - 1

    /** One event: (st, t0) -> new (st, t0); mutates `es` in place. */
    def step(st: Int, t0: Long, es: scala.collection.mutable.ArrayBuffer[(Long, Long)],
        tms: Long, oid: Long, ty: String,
        emit: IndexedSeq[(Long, Long)] => Unit): (Int, Long) = {
      if (st > 0 && tms - t0 >= withinMs) {
        // NFA timeout: abandon; the abandoning event may re-open
        es.clear()
        if (ty == pattern.head) {
          if (last == 0) { emit(IndexedSeq((tms, oid))); (0, 0L) }
          else { es += ((tms, oid)); (1, tms) }
        } else (0, 0L)
      } else if (ty == pattern(st)) {
        val start = if (st == 0) tms else t0
        es += ((tms, oid))
        if (st == last) {
          emit(es.toIndexedSeq); es.clear(); (0, 0L)
        } else (st + 1, start)
      } else (st, t0) // relaxed contiguity — ignore
    }
  }

  /** The STRICT/notNext automaton's step semantics as a row-at-a-time
    * stepper — shared by the batch sorted plan ([[TypedCep.strict]]) and
    * [[graft.streaming.CepStream.matchGroupNext]]; mirrors the
    * [[patternMatchesNextFold]] SQL branch for branch (timeout,
    * notNext-ban, stage advance, strict break, fr-consume). State is
    * (st, t0, fr) — fr = stage just matched, the notNext slot is open. */
  private[graft] final class StrictStepper(pattern: IndexedSeq[String],
      withinMs: Long, nextStages: Set[Int], notNext: Map[Int, Set[String]]) {
    private val last = pattern.length - 1

    private def reopen(tms: Long, ty: String): (Int, Long, Boolean) =
      if (ty == pattern.head) (1, tms, true) else (0, 0L, false)

    def step(st: Int, t0: Long, fr: Boolean, tms: Long, ty: String,
        emit: (Long, Long) => Unit): (Int, Long, Boolean) = {
      if (st > 0 && tms - t0 >= withinMs) reopen(tms, ty)
      else if (fr && notNext.getOrElse(st, Set.empty).contains(ty))
        reopen(tms, ty)
      else if (ty == pattern(st)) {
        val start = if (st == 0) tms else t0
        if (st == last) { emit(start, tms); (0, 0L, false) }
        else (st + 1, start, true)
      } else if (nextStages.contains(st)) reopen(tms, ty)
      else (st, t0, false) // the event consumed the notNext slot
    }
  }

  /** The NEGATION automaton's step semantics — shared by the batch sorted
    * plan ([[TypedCep.neg]]) and [[graft.streaming.CepStream.matchGroupNeg]];
    * mirrors [[patternMatchesNeg]]'s SQL branch for branch. State is
    * (st, t0, te) with st = pattern.length meaning "watching the trailing
    * ban"; [[flush]] is the batch end-of-input (the banned event never
    * came — emit a live watch). */
  private[graft] final class NegStepper(pattern: IndexedSeq[String],
      withinMs: Long, notBetween: Map[Int, Set[String]],
      notAfter: Set[String]) {
    private val last = pattern.length - 1
    private val watch = pattern.length
    private val hasTrailing = notAfter.nonEmpty

    private def reopen(tms: Long, ty: String): (Int, Long, Long) =
      if (ty == pattern.head) {
        if (last == 0 && hasTrailing) (watch, tms, tms)
        else (1, tms, 0L)
      } else (0, 0L, 0L)

    def step(st: Int, t0: Long, te: Long, tms: Long, ty: String,
        emit: (Long, Long) => Unit): (Int, Long, Long) = {
      if (st == watch) {
        if (tms - t0 >= withinMs) { // window closed banned-free: emit
          emit(t0, te); reopen(tms, ty)
        } else if (notAfter.contains(ty)) reopen(tms, ty)
        else (st, t0, te)
      } else if (st > 0 && tms - t0 >= withinMs) reopen(tms, ty)
      else if (st > 0 &&
          notBetween.getOrElse(st, Set.empty).contains(ty)) {
        reopen(tms, ty) // negation guards the gap: ban wins over advance
      } else if (ty == pattern(st)) {
        val start = if (st == 0) tms else t0
        if (st == last) {
          if (hasTrailing) (watch, start, tms)
          else { emit(start, tms); (0, 0L, 0L) }
        } else (st + 1, start, 0L)
      } else (st, t0, te)
    }

    /** Input-end flush: a still-open watch emits (batch semantics). */
    def flush(st: Int, t0: Long, te: Long, emit: (Long, Long) => Unit): Unit =
      if (st == watch) emit(t0, te)
  }

  /** The concurrent-run SKIP-TO-NEXT-ROW automaton's step semantics —
    * shared by the batch sorted plan ([[TypedCep.skipNext]]) and
    * [[graft.streaming.CepStream.matchGroupSkipNext]], so the two cannot
    * drift. `runs` is the key's ACTIVE run set as (stage, start) pairs in
    * OPEN order (Flink's concurrent NFA runs — the honest price of
    * overlap, O(in-window stage-0 events) per key where every other CEP
    * form is O(1)): every stage-0 event opens its own run AFTER existing
    * runs advanced (a run matches strictly after its opening event — the
    * static unroll's `j > s0`), each run emits its EARLIEST in-window
    * completion and dies, and a window-closed run prunes silently as
    * events arrive. For a one-event-per-stage pattern runs advance
    * monotonically (an earlier-opened run is always at a stage >= a
    * later one's, both seeing the same event suffix), so emissions
    * arrive in run-open order — which is exactly what numbers `match_n`
    * by start order in the batch plan. */
  private[graft] final class SkipStepper(pattern: IndexedSeq[String],
      withinMs: Long) {
    private val last = pattern.length - 1

    /** One event over the active run set; returns the surviving runs. */
    def step(runs: Vector[(Int, Long)], tms: Long, ty: String,
        emit: (Long, Long) => Unit): Vector[(Int, Long)] = {
      val next = Vector.newBuilder[(Int, Long)]
      runs.foreach { case (st, t0) =>
        if (tms - t0 >= withinMs) () // window closed: run dead
        else if (ty == pattern(st)) {
          if (st == last) emit(t0, tms) // earliest completion; run dies
          else next += ((st + 1, t0))
        } else next += ((st, t0)) // relaxed contiguity: ignore
      }
      var out = next.result()
      if (ty == pattern.head) {
        if (last == 0) emit(tms, tms)
        else out = out :+ ((1, tms))
      }
      out
    }
  }

  /** The UNTIL-CLOSED loop automaton's step semantics — Flink-CEP's
    * `until(condition)` on the one class that genuinely NEEDS it: a
    * GREEDY UNBOUNDED FINAL loop, which "never knows it is done"
    * ([[validateTimes]]' final-exact-count rule) until a stop-condition
    * event closes it. [[TimesStepper]]'s branches for the leading
    * stages, plus:
    *
    *   - the final stage is a (type, min, Unbounded) loop tracking `te`,
    *     the last ACCEPTED loop event's tms — no emission on count;
    *   - an `untilPred` event while the final loop holds ≥ min events
    *     EMITS (t0, te) — the until event is NOT part of the match,
    *     exactly Flink's stop-condition semantics — and resets (skip
    *     past last row); below the floor it KILLS the partial. Either
    *     way the until event itself falls through to the stage-0 test
    *     (it may reopen a run when the types allow it);
    *   - window expiry DISCARDS a partial (no until arrived in time),
    *     and so does end-of-input — the every-stepper timeout stance;
    *     Flink without a timeout handler does the same.
    *
    * At stages BEFORE the final loop the until event is an ordinary
    * non-matching event (relaxed contiguity — ignored); requiring the
    * until type to differ from every stage type keeps that
    * unambiguous. State is (st, c, t0, te) — one long beyond the
    * quantified automaton; a separate stepper so the five shipped
    * [[TimesStepper]] paths' pinned semantics cannot be disturbed. */
  private[graft] final class UntilStepper[E](
      pattern: IndexedSeq[(E => Boolean, Int, Int)], withinMs: Long,
      untilPred: E => Boolean, tmsOf: E => Long) {
    private val last = pattern.length - 1

    /** One event: (st, c, t0, te) -> next; emit on an until-close. */
    def step(st: Int, c: Int, t0: Long, te: Long, e: E,
        emit: (Long, Long) => Unit): (Int, Int, Long, Long) = {
      val tms = tmsOf(e)
      def enter0: (Int, Int, Long, Long) =
        if (pattern.head._1(e)) (0, 1, tms, if (last == 0) tms else 0L)
        else (0, 0, 0L, 0L)
      if (c > 0 && tms - t0 >= withinMs) enter0
      else if (c == 0) enter0
      else if (st == last && untilPred(e)) {
        if (c >= pattern(st)._2) emit(t0, te)
        enter0
      } else {
        val (p, mn, mx) = pattern(st)
        if (p(e) && (mx == Unbounded || c < mx))
          (st, c + 1, t0, if (st == last) tms else te)
        else if (st < last && c >= mn) {
          ((st + 1) to last).view
            .takeWhile(j => (st + 1 until j).forall(pattern(_)._2 == 0))
            .find(j => pattern(j)._1(e)) match {
            case Some(j) => (j, 1, t0, if (j == last) tms else te)
            case None => (st, c, t0, te)
          }
        } else (st, c, t0, te)
      }
    }
  }

  /** The CONSECUTIVE-LOOP automaton's step semantics (Flink-CEP's
    * `consecutive()` on `times`/`oneOrMore` loops — strict contiguity
    * WITHIN a loop, while the stages themselves stay `followedBy`):
    * [[TimesStepper]]'s greedy/relaxed branches plus, for stages in
    * `consecutive`, a BREAK rule on any non-matching event while the
    * loop is accumulating —
    *
    *   - below the loop's floor (c < min): the partial DIES (the
    *     breaking event may itself reopen a stage-0 run);
    *   - at or above the floor: the loop CLOSES (`cl` — no further
    *     extension) and the partial waits RELAXED for the next stage,
    *     the deterministic longest-unbroken-run reading of Flink's
    *     branching NFA (the same determinization stance as the greedy
    *     loop rule, documented on [[patternMatchesTimes]]).
    *
    * State is (st, c, cl, t0) — one boolean beyond the quantified
    * automaton. Kept a separate stepper from [[TimesStepper]] (which
    * five shipped paths share) so the pinned non-consecutive semantics
    * cannot be disturbed; [[patternMatchesTimesConsecutive]] requires a
    * non-empty `consecutive` set, so the two never overlap. */
  private[graft] final class ConsecStepper[E](
      pattern: IndexedSeq[(E => Boolean, Int, Int)], withinMs: Long,
      consecutive: Set[Int], tmsOf: E => Long) {
    private val last = pattern.length - 1

    /** One event: (st, c, cl, t0) -> next; emit on completion. */
    def step(st: Int, c: Int, cl: Boolean, t0: Long, e: E,
        emit: (Long, Long) => Unit): (Int, Int, Boolean, Long) = {
      val tms = tmsOf(e)
      def enter0: (Int, Int, Boolean, Long) =
        if (pattern.head._1(e)) {
          if (last == 0 && pattern.head._2 == 1) {
            emit(tms, tms); (0, 0, false, 0L)
          } else (0, 1, false, tms)
        } else (0, 0, false, 0L)
      if (c > 0 && tms - t0 >= withinMs) enter0
      else if (c == 0) enter0
      else {
        val (p, mn, mx) = pattern(st)
        if (p(e) && !cl && (mx == Unbounded || c < mx)) {
          if (st == last && c + 1 == mn) { emit(t0, tms); (0, 0, false, 0L) }
          else (st, c + 1, cl, t0)
        } else {
          // ONE reachable-stage scan (TimesStepper's single-find shape —
          // the r12 advisor flagged the exists+find double evaluation)
          val advance = if (st < last && c >= mn)
            ((st + 1) to last).view
              .takeWhile(j => (st + 1 until j).forall(pattern(_)._2 == 0))
              .find(j => pattern(j)._1(e))
          else None
          advance match {
            case Some(j) =>
              if (j == last && pattern(j)._2 == 1) { emit(t0, tms); (0, 0, false, 0L) }
              else (j, 1, false, t0)
            case None if consecutive.contains(st) && c >= 1 =>
              // the loop was accumulating and e neither extended nor
              // advanced: consecutive's break rule
              if (c < mn) enter0
              else (st, c, true, t0)
            case None => (st, c, cl, t0)
          }
        }
      }
    }
  }

  /** The BRANCHING-NFA step semantics — the opt-in for the
    * [[overlapWarnings]] class (round 13, VERDICT r12 item 5): one run
    * FAMILY per key (skip past last row, exactly [[TimesStepper]]'s
    * after-match stance), but at a CHOICE POINT — an event that both
    * extends a flexible/optional stage and advances a later stage — the
    * family forks and every branch continues, and ALL reachable advance
    * targets fork (not just the first). The family emits at its EARLIEST
    * completion (any branch) and resets. On the warned fixtures this
    * reproduces the skip-branch matches Flink's branching NFA finds and
    * the deterministic greedy reading drops; on patterns with no choice
    * point the two coincide (CepSpec pins both).
    *
    * State is the branch SET — (stage, count) pairs sharing one t0,
    * bounded by Σ stage max-counts, NOT by events (the r12 SkipStepper
    * argument: concurrent branches are cheap on the sorted plan). */
  private[graft] final class NfaStepper[E](
      pattern: IndexedSeq[(E => Boolean, Int, Int)], withinMs: Long,
      tmsOf: E => Long) {
    private val last = pattern.length - 1

    /** One event: (branch set, t0) -> next; empty set = idle. */
    def step(branches: Set[(Int, Int)], t0: Long, e: E,
        emit: (Long, Long) => Unit): (Set[(Int, Int)], Long) = {
      val tms = tmsOf(e)
      def open: (Set[(Int, Int)], Long) =
        if (pattern.head._1(e)) {
          if (last == 0 && pattern.head._2 == 1) {
            emit(tms, tms); (Set.empty, 0L)
          } else (Set((0, 1)), tms)
        } else (Set.empty, 0L)
      if (branches.isEmpty) open
      else if (tms - t0 >= withinMs) open
      else {
        var complete = false
        val next = scala.collection.mutable.Set.empty[(Int, Int)]
        branches.foreach { case (st, c) =>
          val (p, mn, mx) = pattern(st)
          var took = false
          if (p(e) && (mx == Unbounded || c < mx)) {
            took = true
            if (st == last && c + 1 == mn) complete = true
            else next += ((st, c + 1))
          }
          if (st < last && c >= mn) {
            ((st + 1) to last).view
              .takeWhile(j => (st + 1 until j).forall(pattern(_)._2 == 0))
              .filter(j => pattern(j)._1(e))
              .foreach { j =>
                took = true
                if (j == last && pattern(j)._2 == 1) complete = true
                else next += ((j, 1))
              }
          }
          // skip-till-next contiguity: a branch holds only when the event
          // matched NOTHING for it (a matching event is consumed)
          if (!took) next += ((st, c))
        }
        if (complete) { emit(t0, tms); (Set.empty, 0L) }
        else (next.toSet, t0)
      }
    }
  }

  /** The SKIP-TO-STAGE automaton (Flink's AfterMatchSkipStrategy
    * SKIP_TO_FIRST / SKIP_TO_LAST, which coincide on the
    * one-event-per-stage class): a single greedy run exactly like
    * [[patternMatches]]', except that after a match completes the scan
    * RESUMES AT the match's stage-`skipTo` event (inclusive) instead of
    * past the last row — matches may overlap, each new match's start
    * strictly after the previous one's (so emission order IS start
    * order and the loop terminates; `skipTo` = 0 would resume at the
    * match's own first event and loop forever — Flink throws there too,
    * and the operator rejects it).
    *
    * Mechanics: while the live partial is at or beyond stage `skipTo`,
    * events BUFFER (the contiguous range from the stage-`skipTo` event
    * through the current point — matched and relaxed-ignored alike); on
    * emit the buffer REPLAYS through the reset automaton before any
    * newer events. Buffer memory is O(one partial's in-window span) per
    * key — the same bounded class as [[SkipStepper]]'s run set, and
    * nothing like the retired per-key event arrays. Shared by the batch
    * sorted plan ([[TypedCep.skipTo]]) and
    * [[graft.streaming.CepStream.attachSkipTo]] (the buffer persists in
    * keyed state across micro-batches), so the two cannot drift. */
  private[graft] final class SkipToRunner(pattern: IndexedSeq[String],
      withinMs: Long, skipTo: Int) {
    private val last = pattern.length - 1
    var st = 0
    var t0 = 0L
    val buf = scala.collection.mutable.ArrayDeque.empty[(Long, Long, String)]
    private val replay =
      scala.collection.mutable.ArrayDeque.empty[(Long, Long, String)]

    /** Feed one (already key-sorted) event; drains any replay segments
      * the event's emissions trigger before returning, so caller-held
      * state (st, t0, buf) is always between-events consistent. */
    def feed(tms: Long, oid: Long, ty: String,
        emit: (Long, Long) => Unit): Unit = {
      replay.append((tms, oid, ty))
      while (replay.nonEmpty) {
        val (etms, eoid, ety) = replay.removeHead()
        step(etms, eoid, ety, emit)
      }
    }

    private def step(tms: Long, oid: Long, ty: String,
        emit: (Long, Long) => Unit): Unit = {
      if (st > 0 && tms - t0 >= withinMs) {
        // NFA timeout: the partial dies (buffer with it); the abandoning
        // event falls through to the stage-0 test below
        st = 0; t0 = 0L; buf.clear()
      }
      if (ty == pattern(st)) {
        if (st == skipTo) buf.clear()
        if (st >= skipTo) buf.append((tms, oid, ty))
        val start = if (st == 0) tms else t0
        if (st == last) {
          emit(start, tms)
          st = 0; t0 = 0L
          val seg = buf.toVector
          buf.clear()
          replay.prependAll(seg) // resume AT the stage-skipTo event
        } else { st += 1; t0 = start }
      } else if (st > skipTo) buf.append((tms, oid, ty))
    }
  }

  /** The stateless per-group automaton run shared by the relaxed typed
    * plans: stream the (already sorted) iterator through one
    * [[TimesStepper]], numbering matches per key in time order. */
  private def runGroupK[K, E](preds: IndexedSeq[(E => Boolean, Int, Int)],
      withinMs: Long, tmsOf: E => Long)(
      k: K, it: Iterator[E]): Iterator[CepMatchK[K]] = {
    val stepper = new TimesStepper[E](preds, withinMs, tmsOf)
    val out = scala.collection.mutable.ListBuffer.empty[CepMatchK[K]]
    var st = 0; var c = 0; var t0 = 0L; var n = 0
    it.foreach { e =>
      val next = stepper.step(st, c, t0, e, (s, en) => {
        n += 1; out += CepMatchK(k, n, s, en)
      })
      st = next._1; c = next._2; t0 = next._3
    }
    out.iterator
  }

  /** Executor-side evaluation bundle for [[TypedCep.iter]]: the BOUND
    * boolean stage expressions (serializable Catalyst trees, already
    * wrapped null→false and bound to the (e, first) input row) compiled
    * to predicates lazily ONCE PER TASK, plus external-Row→InternalRow
    * serializers for the event struct and the captured opener. Kept
    * `@transient lazy` because compiled predicates and serializers are
    * not serializable — only the expression trees and schemas ship. */
  private final class IterEval(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      evType: org.apache.spark.sql.types.StructType,
      fType: org.apache.spark.sql.types.StructType) extends Serializable {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
    import org.apache.spark.sql.Row

    @transient lazy val preds: IndexedSeq[
        org.apache.spark.sql.catalyst.expressions.BasePredicate] =
      exprs.map(e =>
        org.apache.spark.sql.catalyst.expressions.Predicate.create(e))
        .toIndexedSeq
    @transient private lazy val evSer =
      ExpressionEncoder(RowEncoder.encoderFor(evType)).createSerializer()
    @transient private lazy val fSer =
      ExpressionEncoder(RowEncoder.encoderFor(fType)).createSerializer()

    /** (k, tms, oid, payload…) row → the `e` struct row. REUSED buffer —
      * valid only until the next call. */
    def toEv(r: Row, nPay: Int): InternalRow = {
      val vals = new Array[Any](2 + nPay)
      vals(0) = r.get(1); vals(1) = r.get(2)
      var i = 0
      while (i < nPay) { vals(2 + i) = r.get(3 + i); i += 1 }
      evSer(Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals)))
    }

    /** (k, tms, oid, payload…) row → an OWNED copy of the `first`
      * (payload-only) struct row — the capture outlives the buffer. */
    def toFirst(r: Row, nPay: Int): InternalRow = {
      val vals = new Array[Any](nPay)
      var i = 0
      while (i < nPay) { vals(i) = r.get(3 + i); i += 1 }
      fSer(Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))).copy()
    }
  }

  /** The TYPED SORTED-ITERATOR physical plans, generic in the key type —
    * the SPILL-SAFE alternative to the row-local SQL `aggregate` fold:
    * instead of `collect_list`-ing each key's pattern events into one
    * in-memory array and folding it row-locally (per-key memory = the
    * busiest key's event count, and Catalyst copies the fold accumulator
    * per element, so a celebrity key's fold is QUADRATIC in copy work —
    * measured in ScaleProbe `cephot`: 195 s at 400 k hot-key events vs
    * 9.4 s at 10 M on the sorted plan), events STREAM through the
    * automaton as a sorted per-group iterator (`flatMapSortedGroups` =
    * one key shuffle + a sort-within-partitions that SPILLS like any
    * Spark sort). Per-key memory is O(pattern) state + O(matches in
    * flight) — flat however hot the key. Same scan pre-filter, same
    * single shuffle as the fold.
    *
    * [[typedCep]] routes by the RESOLVED key type: integral keys run as
    * `Option[Long]` (a NULL key groups as None — exactly the SQL fold's
    * `GROUP BY` null-group semantics, no encoder NPE; byte/short/int
    * widen losslessly and the output key casts back), string keys as
    * `String` (null string keys likewise group). Every other key type
    * (decimal, double, struct, …) returns None and keeps the `aggregate`
    * fold — correct, with the fold's celebrity-key caveat documented on
    * each operator. */
  private[graft] sealed trait TypedCep {
    def times(pattern: Seq[(String, Int, Int)], withinMs: Long): DataFrame
    def timesNfa(pattern: Seq[(String, Int, Int)], withinMs: Long): DataFrame
    def timesConsecutive(pattern: Seq[(String, Int, Int)], withinMs: Long,
        consecutive: Set[Int]): DataFrame
    def timesUntil(pattern: Seq[(String, Int, Int)], withinMs: Long,
        untilType: String): DataFrame
    def pred(quant: Seq[(Int, Int)], withinMs: Long): DataFrame
    def strict(pattern: Seq[String], withinMs: Long, nextStages: Set[Int],
        notNext: Map[Int, Seq[String]]): DataFrame
    def neg(pattern: Seq[String], withinMs: Long,
        notBetween: Map[Int, Seq[String]], notAfter: Seq[String]): DataFrame
    def skipNext(pattern: Seq[String], withinMs: Long): DataFrame
    def skipTo(pattern: Seq[String], withinMs: Long, skipTo: Int): DataFrame
    def select(pattern: Seq[String], withinMs: Long): DataFrame
    def iter(stages: Seq[(String, Int, Int)], withinMs: Long,
        payload: Seq[String]): DataFrame
  }

  private final class TypedCepImpl[K](proj: DataFrame,
      restore: DataFrame => DataFrame,
      keyOf: org.apache.spark.sql.Row => K)(
      implicit kt: scala.reflect.runtime.universe.TypeTag[K])
      extends TypedCep {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import scala.collection.mutable.{ArrayBuffer, ListBuffer}

    // driver-side only (arguments to as/groupByKey/flatMapSortedGroups);
    // the group lambdas below reference METHOD-LOCAL values exclusively,
    // so no DataFrame-holding `this` is ever captured into a task. Lazy:
    // each operator call uses at most two of the five — no call pays the
    // reflection+serializer derivation for encoders it never touches
    private lazy val kEnc: Encoder[K] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[K]()
    private lazy val evEnc: Encoder[CepEvK[K]] = Encoders.product[CepEvK[K]]
    private lazy val evPEnc: Encoder[CepEvPK[K]] =
      Encoders.product[CepEvPK[K]]
    private lazy val mEnc: Encoder[CepMatchK[K]] =
      Encoders.product[CepMatchK[K]]
    private lazy val selEnc: Encoder[CepSelK[K]] =
      Encoders.product[CepSelK[K]]

    def times(pattern: Seq[(String, Int, Int)], withinMs: Long): DataFrame = {
      val preds = pattern.map { case (t, mn, mx) =>
        (((e: CepEvK[K]) => e.ty == t), mn, mx) }.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty"))(
          runGroupK[K, CepEvK[K]](preds, withinMs, _.tms))(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def timesNfa(pattern: Seq[(String, Int, Int)], withinMs: Long): DataFrame = {
      val preds = pattern.map { case (t, mn, mx) =>
        (((e: CepEvK[K]) => e.ty == t), mn, mx) }.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new NfaStepper[CepEvK[K]](preds, withinMs, _.tms)
            val out = ListBuffer.empty[CepMatchK[K]]
            var br = Set.empty[(Int, Int)]; var t0 = 0L; var n = 0
            it.foreach { e =>
              val next = stepper.step(br, t0, e, (st0, en) => {
                n += 1; out += CepMatchK(k, n, st0, en)
              })
              br = next._1; t0 = next._2
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def timesConsecutive(pattern: Seq[(String, Int, Int)], withinMs: Long,
        consecutive: Set[Int]): DataFrame = {
      val preds = pattern.map { case (t, mn, mx) =>
        (((e: CepEvK[K]) => e.ty == t), mn, mx) }.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new ConsecStepper[CepEvK[K]](preds, withinMs,
              consecutive, _.tms)
            val out = ListBuffer.empty[CepMatchK[K]]
            var st = 0; var c = 0; var cl = false; var t0 = 0L; var n = 0
            it.foreach { e =>
              val next = stepper.step(st, c, cl, t0, e, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
              st = next._1; c = next._2; cl = next._3; t0 = next._4
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def timesUntil(pattern: Seq[(String, Int, Int)], withinMs: Long,
        untilType: String): DataFrame = {
      val preds = pattern.map { case (t, mn, mx) =>
        (((e: CepEvK[K]) => e.ty == t), mn, mx) }.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new UntilStepper[CepEvK[K]](preds, withinMs,
              _.ty == untilType, _.tms)
            val out = ListBuffer.empty[CepMatchK[K]]
            var st = 0; var c = 0; var t0 = 0L; var te = 0L; var n = 0
            it.foreach { e =>
              val next = stepper.step(st, c, t0, te, e, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
              st = next._1; c = next._2; t0 = next._3; te = next._4
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def pred(quant: Seq[(Int, Int)], withinMs: Long): DataFrame = {
      val preds = quant.zipWithIndex.map { case ((mn, mx), i) =>
        (((e: CepEvPK[K]) => e.ps(i)), mn, mx) }.toIndexedSeq
      restore(proj.as[CepEvPK[K]](evPEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ps"))(
          runGroupK[K, CepEvPK[K]](preds, withinMs, _.tms))(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def strict(pattern: Seq[String], withinMs: Long, nextStages: Set[Int],
        notNext: Map[Int, Seq[String]]): DataFrame = {
      val pat = pattern.toIndexedSeq
      val bans = notNext.map { case (i, ts) => i -> ts.toSet }
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new StrictStepper(pat, withinMs, nextStages, bans)
            val out = ListBuffer.empty[CepMatchK[K]]
            var st = 0; var t0 = 0L; var fr = false; var n = 0
            it.foreach { e =>
              val next = stepper.step(st, t0, fr, e.tms, e.ty, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
              st = next._1; t0 = next._2; fr = next._3
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def neg(pattern: Seq[String], withinMs: Long,
        notBetween: Map[Int, Seq[String]],
        notAfter: Seq[String]): DataFrame = {
      val pat = pattern.toIndexedSeq
      val between = notBetween.map { case (i, ts) => i -> ts.toSet }
      val after = notAfter.toSet
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new NegStepper(pat, withinMs, between, after)
            val out = ListBuffer.empty[CepMatchK[K]]
            var st = 0; var t0 = 0L; var te = 0L; var n = 0
            def emit(s: Long, en: Long): Unit = {
              n += 1; out += CepMatchK(k, n, s, en)
            }
            it.foreach { e =>
              val next = stepper.step(st, t0, te, e.tms, e.ty, emit)
              st = next._1; t0 = next._2; te = next._3
            }
            stepper.flush(st, t0, te, emit)
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def skipNext(pattern: Seq[String], withinMs: Long): DataFrame = {
      val pat = pattern.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new SkipStepper(pat, withinMs)
            val out = ListBuffer.empty[CepMatchK[K]]
            var runs = Vector.empty[(Int, Long)]
            var n = 0
            it.foreach { e =>
              runs = stepper.step(runs, e.tms, e.ty, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def skipTo(pattern: Seq[String], withinMs: Long,
        skipToStage: Int): DataFrame = {
      val pat = pattern.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val runner = new SkipToRunner(pat, withinMs, skipToStage)
            val out = ListBuffer.empty[CepMatchK[K]]
            var n = 0
            it.foreach { e =>
              runner.feed(e.tms, e.oid, e.ty, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
            }
            out
        }(mEnc)
        .toDF("k", "match_n", "start_tms", "end_tms"))
    }

    def select(pattern: Seq[String], withinMs: Long): DataFrame = {
      val pat = pattern.toIndexedSeq
      restore(proj.as[CepEvK[K]](evEnc)
        .groupByKey(_.k)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid"), col("ty")) {
          (k: K, it: Iterator[CepEvK[K]]) =>
            val stepper = new SelectStepper(pat, withinMs)
            val out = ListBuffer.empty[CepSelK[K]]
            // es = the partial's matched (tms, oid) per stage — O(pattern)
            val es = ArrayBuffer.empty[(Long, Long)]
            var st = 0; var t0 = 0L; var n = 0
            it.foreach { e =>
              val next = stepper.step(st, t0, es, e.tms, e.oid, e.ty, evs => {
                n += 1
                evs.zipWithIndex.foreach { case ((t, o), j) =>
                  out += CepSelK(k, n, j + 1, t, o)
                }
              })
              st = next._1; t0 = next._2
            }
            out
        }(selEnc)
        .toDF("k", "match_n", "stage_n", "ev_tms", "ev_oid"))
    }

    def iter(stages: Seq[(String, Int, Int)], withinMs: Long,
        payload: Seq[String]): DataFrame = {
      import org.apache.spark.sql.catalyst.expressions.{Alias,
        AttributeReference, AttributeSeq, BindReferences, Coalesce, Literal}
      import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
      import org.apache.spark.sql.types.{BooleanType, LongType, StructField,
        StructType}
      val spark = proj.sparkSession
      // the event struct visible to predicates as `e` (tms, oid, payload…)
      // and the captured opener visible as `first` (payload fields only) —
      // the exact field surface the SQL fold's `e` / `acc.f0` expose
      val payFields = payload.map(n => proj.schema(n))
      val evType = StructType(
        StructField("tms", LongType, nullable = false) +:
        StructField("oid", LongType, nullable = false) +: payFields)
      val fType = StructType(payFields)
      val eAttr = AttributeReference("e", evType, nullable = false)()
      val fAttr = AttributeReference("first", fType, nullable = true)()
      val rel = LocalRelation(Seq(eAttr, fAttr))
      // each stage predicate is parsed and run through the SESSION'S OWN
      // analyzer against a two-attribute relation (e, first) — the same
      // resolution, implicit casts, and function registry the SQL fold's
      // analysis applies, so the two paths cannot drift on coercion; the
      // null→false wrap mirrors the fold's CASE WHEN semantics
      val bound = stages.map { case (sql, _, _) =>
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val resolved = spark.sessionState
          .executePlan(Project(Seq(Alias(parsed, "p")()), rel))
          .analyzed.asInstanceOf[Project]
          .projectList.head.asInstanceOf[Alias].child
        require(resolved.dataType == BooleanType,
          s"stage predicate must be BOOLEAN, got " +
            s"${resolved.dataType.catalogString}: $sql")
        BindReferences.bindReference(
          Coalesce(Seq(resolved, Literal(false))),
          AttributeSeq(Seq(eAttr, fAttr)))
      }
      val quant = stages.map(s => (s._2, s._3))
      val nPay = payload.length
      val h = new IterEval(bound, evType, fType)
      val ds = proj.groupByKey(keyOf)(kEnc)
        .flatMapSortedGroups(col("tms"), col("oid")) {
          (k: K, it: Iterator[Row]) =>
            // run state OUTSIDE the stepper: the current event's struct
            // (reused buffer) and the live run's captured opener (owned
            // copy, set by onOpen at stage-0 open — the SQL fold's capF0)
            var curE: org.apache.spark.sql.catalyst.InternalRow = null
            var f0: org.apache.spark.sql.catalyst.InternalRow = null
            val joint =
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
            val preds = quant.zipWithIndex.map { case ((mn, mx), i) =>
              (((r: Row) => {
                joint.update(0, curE); joint.update(1, f0)
                h.preds(i).eval(joint)
              }), mn, mx)
            }.toIndexedSeq
            val stepper = new TimesStepper[Row](preds, withinMs,
              _.getLong(1), onOpen = r => f0 = h.toFirst(r, nPay))
            val out = ListBuffer.empty[CepMatchK[K]]
            var st = 0; var c = 0; var t0 = 0L; var n = 0
            it.foreach { r =>
              curE = h.toEv(r, nPay)
              val next = stepper.step(st, c, t0, r, (s, en) => {
                n += 1; out += CepMatchK(k, n, s, en)
              })
              st = next._1; c = next._2; t0 = next._3
            }
            out
        }(mEnc)
      restore(ds.toDF("k", "match_n", "start_tms", "end_tms"))
    }
  }

  /** The r12 verdict's last silent cliff, made LOUD at plan time (the
    * [[overlapWarnings]] stance): a key type with no typed route falls
    * back to the SQL `aggregate` fold, whose accumulator Catalyst copies
    * per element — O(events × matches) PER HOT KEY within one
    * fold/batch. Correct, but a 40 k-event hot key that the routed
    * stepper streams in ~2 s took the fold >100 s (the r12 skipnexthot
    * probe) — a porter keying CEP on a decimal/double/struct should hear
    * about the cliff before the job does. */
  private[graft] def keyRouteWarning(dt: org.apache.spark.sql.types.DataType): String =
    s"CEP key type ${dt.catalogString} has no typed sorted-iterator " +
      "route (integral and string keys do) — falling back to the SQL " +
      "aggregate fold, which is QUADRATIC per hot key within a batch " +
      "(accumulator copied per element). Correct at modest per-key event " +
      "counts; for hot keys, cast the key to BIGINT/STRING (a stable " +
      "surrogate) so the pattern streams through the routed plan."

  /** Route a (k, …) projection to the typed sorted-iterator plan family,
    * or None when the key type has no lossless typed route (the caller
    * keeps the SQL `aggregate` fold — WARNED, see [[keyRouteWarning]]).
    * See [[TypedCep]] for the key-type table and null-key semantics. */
  private[graft] def typedCep(proj: DataFrame): Option[TypedCep] = {
    import org.apache.spark.sql.types._
    proj.schema("k").dataType match {
      case LongType =>
        Some(new TypedCepImpl[Option[Long]](proj, identity,
          r => if (r.isNullAt(0)) None else Some(r.getLong(0))))
      case dt @ (ByteType | ShortType | IntegerType) =>
        Some(new TypedCepImpl[Option[Long]](
          proj.withColumn("k", col("k").cast("long")),
          out => out.withColumn("k", col("k").cast(dt)),
          r => if (r.isNullAt(0)) None else Some(r.getLong(0))))
      case StringType =>
        Some(new TypedCepImpl[String](proj, identity, r => r.getString(0)))
      case dt =>
        log.warn(keyRouteWarning(dt))
        None
    }
  }

  /** Standard projection for the typed plans; [[typedCep]] routes on the
    * RESOLVED key type. */
  private def projEvents(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column): DataFrame =
    df.select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
      ordCol.cast("long").as("oid"), typeCol.cast("string").as("ty"))

  /** Flink-CEP GROUP pattern — `Pattern.begin(subPattern).times(n)` for
    * the one-event-per-stage class (a `next()`-free sub-pattern under
    * relaxed contiguity): the group repeats WHOLE, exactly `times`
    * times, all within one window of the first event. Semantically this
    * IS the unrolled stage list — Flink's NFA compiler expands an
    * exact-count group `times` into n copies of the sub-pattern's state
    * chain — so the operator delegates to [[patternMatches]] on
    * `Seq.fill(times)(group).flatten` and inherits its routed
    * sorted-iterator plan, skip-past-last-row semantics, and oracle
    * (`q_cep_group`). VARIABLE group loops (`times(min, max)` /
    * `oneOrMore()` over a sub-pattern) are PERMANENTLY absent (round-15
    * policy, COVERAGE.md §flink-cep): each repetition count forks a run
    * in Flink's branching NFA, which the deterministic greedy plans here
    * do not express. Per-stage quantifiers INSIDE a match
    * ([[patternMatchesTimes]]) cover the loop use cases that do
    * determinize, and `until()`-closed unbounded loops — the one Flink
    * idiom that genuinely needed a stop condition — are shipped as
    * [[patternMatchesUntil]]. */
  def patternMatchesGroup(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, group: Seq[String], times: Int,
      withinMs: Long): DataFrame = {
    require(group.nonEmpty, "group must not be empty")
    require(times >= 1, s"times must be >= 1, got $times")
    require(group.length * times >= 2,
      "unrolled pattern needs >= 2 stages (a 1x1 group is just a filter)")
    patternMatches(df, keyCol, tsMsCol, ordCol, typeCol,
      Seq.fill(times)(group).flatten, withinMs)
  }

  /** Matches of `pattern` (ordered event-type names, length ≥ 1, repeats
    * allowed) per key, within `withinMs` of the match's first event.
    *
    * Physical plan: integral and string keys stream through the typed
    * sorted-iterator automaton ([[TypedCep.times]] — spill-safe, no
    * per-key array; NULL keys group together, the SQL null-group
    * semantics); every other key type keeps the row-local `aggregate`
    * fold below (Flink-CEP keyed-state memory parity, per-key memory =
    * that key's pattern-event count — quadratic copy work on a hot key,
    * see [[TypedCep]]).
    *
    * @param ordCol  deterministic tie-break within equal timestamps
    * @return (k, match_n, start_tms, end_tms) — one row per match, match_n
    *         numbered 1.. per key in time order; keys with no match absent */
  def patternMatches(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val proj = projEvents(df.filter(typeCol.isin(pattern.distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj) match {
      case Some(t) => return t.times(pattern.map((_, 1, 1)), withinMs)
      case None =>
    }
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
        WHEN acc.st > 0 AND e.tms - acc.t0 >= $withinMs THEN $afterTimeout
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

  /** Sentinel for an unbounded stage maximum (`oneOrMore`-style loops). */
  val Unbounded: Int = Int.MaxValue

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.ops.Cep")

  /** Greedy-vs-NFA divergence callout ([[patternMatchesTimes]]' migration
    * note, made loud at validation time): when a stage that still has a
    * CHOICE — optional (min 0) or a flexible loop (max > min) — shares
    * its type/predicate text with the NEXT stage, the deterministic
    * greedy reading EXTENDS/MATCHES the earlier stage and can emit FEWER
    * matches than Flink's branching NFA, which also explores the skip
    * branch (pinned by CepSpec "optional loop with a floor elsewhere").
    * Returns one message per such adjacent pair; predicates that overlap
    * without being textually identical cannot be detected statically. */
  private[graft] def overlapWarnings(
      pattern: Seq[(String, Int, Int)]): Seq[String] =
    pattern.zip(pattern.tail).zipWithIndex.collect {
      case (((t1, mn1, mx1), (t2, _, _)), i)
          if t1 == t2 && (mn1 == 0 || mx1 > mn1) =>
        s"CEP stages $i and ${i + 1} share the type/predicate '$t1' while " +
          s"stage $i is optional or a flexible loop: the deterministic " +
          "greedy reading feeds the earlier stage first and can emit " +
          "FEWER matches than Flink's branching NFA (the skip branch is " +
          "never explored). Give the stages disjoint predicates, drop " +
          "the optional stage, or opt into patternMatchesTimesNfa (the " +
          "branching form) if you need Flink's skip-branch matches."
    }

  private[graft] def validateTimes(pattern: Seq[(String, Int, Int)],
      withinMs: Long, warnOverlap: Boolean = true): Unit = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    // the NFA form IS the remedy the warning names — it passes false
    if (warnOverlap) overlapWarnings(pattern).foreach(log.warn)
    pattern.zipWithIndex.foreach { case ((t, mn, mx), i) =>
      // middle stages may be OPTIONAL (min 0 — Flink's optional()); the
      // first stage stamps the match start and the last stage emits, so
      // both need a real event
      val floor = if (i == 0 || i == pattern.length - 1) 1 else 0
      require(mn >= floor && mx >= math.max(mn, 1),
        s"stage '$t' needs $floor <= min <= max (max >= 1), got ($mn, $mx)")
    }
    require(pattern.last._2 == pattern.last._3,
      "the final stage must be an exact count (min == max) — a greedy " +
        "unbounded last stage never knows it is done; bound it or add a " +
        "terminal stage")
  }

  /** The quantified automaton's step as a SQL `(acc, e) -> CASE...` lambda
    * body over state (st INT, c INT, t0 BIGINT, ms ARRAY) — shared between
    * the batch fold (zero-seeded) and [[graft.streaming.IncrementalCep]]
    * (seeded from the persistent per-key state), so the two can never
    * drift branch-wise. */
  private[graft] def timesFoldStep(pattern: Seq[(String, Int, Int)],
      withinMs: Long): String =
    timesFoldStepPred(pattern.map { case (t, mn, mx) =>
      (s"e.ty = ${esc(t)}", mn, mx) }, withinMs)

  /** [[timesFoldStep]] generalized to PREDICATE stages: each stage is an
    * arbitrary SQL boolean over the event struct `e` (Flink's `where()`
    * conditions — type equality is just one predicate). Same greedy /
    * relaxed / exact-final-count semantics.
    *
    * `capture` (name → SQL type, usually empty) adds an `f0` state field
    * holding the listed event fields as captured at stage-0 OPEN — the
    * ITERATIVE-condition surface: predicates may then reference
    * `acc.f0.<field>` (the [[patternMatchesIter]] API spells it
    * `first.<field>`). With `capture` empty the generated state is
    * byte-identical to the pre-iterative form — the typed paths and
    * persisted [[graft.streaming.IncrementalCep]] layouts are untouched. */
  private[graft] def timesFoldStepPred(pattern: Seq[(String, Int, Int)],
      withinMs: Long, capture: Seq[(String, String)] = Nil): String = {
    val last = pattern.length - 1
    val (pred0, mn0, _) = pattern.head
    val nullF0 =
      if (capture.isEmpty) ""
      else s"CAST(NULL AS struct<${capture.map { case (n, t) => s"$n: $t" }
        .mkString(", ")}>)"
    val capF0 =
      if (capture.isEmpty) ""
      else s"named_struct(${capture.map { case (n, _) => s"'$n', e.$n" }
        .mkString(", ")})"
    // every state constructor routes through mk so the optional f0 slot
    // can never be forgotten in one branch
    def mk(st: String, c: String, t0: String, f0: String, ms: String) =
      if (capture.isEmpty)
        s"named_struct('st', $st, 'c', $c, 't0', $t0, 'ms', $ms)"
      else
        s"named_struct('st', $st, 'c', $c, 't0', $t0, 'f0', $f0, 'ms', $ms)"
    def idle(ms: String) = mk("0", "0", "CAST(0 AS BIGINT)", nullF0, ms)
    def emit(msBase: String, start: String) =
      mk("0", "0", "CAST(0 AS BIGINT)", nullF0,
        s"array_append($msBase, named_struct('s', $start, 'e', e.tms))")
    // opening stage 0 on event e (also the post-timeout / post-emit re-open)
    val enter0 =
      if (last == 0 && mn0 == 1) emit("acc.ms", "e.tms")
      else mk("0", "1", "e.tms", capF0, "acc.ms")
    val reopen = s"IF(($pred0), $enter0, ${idle("acc.ms")})"
    val branches = pattern.zipWithIndex.flatMap { case ((p, mn, mx), i) =>
      // greedy EXTEND first: while the loop can accept, its own predicate
      // feeds it
      val extGuard = s"acc.st = $i AND acc.c >= 1 AND ($p)" +
        (if (mx == Unbounded) "" else s" AND acc.c < $mx")
      val bump = mk(s"$i", "acc.c + 1", "acc.t0", "acc.f0", "acc.ms")
      val extRes =
        if (i == last) s"IF(acc.c + 1 = $mn, ${emit("acc.ms", "acc.t0")}, $bump)"
        else bump
      val ext = s"WHEN $extGuard THEN $extRes"
      // advance targets: the next stage, plus every further stage
      // reachable by SKIPPING optional (min-0) stages in between; listed
      // ascending so greedy prefers matching an optional stage over
      // skipping it
      val adv = if (i == last) Nil else {
        ((i + 1) to last)
          .takeWhile(j => (i + 1 until j).forall(pattern(_)._2 == 0))
          .map { j =>
            val (pj, mnJ, _) = pattern(j)
            val res =
              if (j == last && mnJ == 1) emit("acc.ms", "acc.t0")
              else mk(s"$j", "1", "acc.t0", "acc.f0", "acc.ms")
            s"WHEN acc.st = $i AND acc.c >= $mn AND ($pj) THEN $res"
          }
      }
      Seq(ext) ++ adv
    }.mkString("\n        ")
    s"""(acc, e) -> CASE
        WHEN acc.c > 0 AND e.tms - acc.t0 >= $withinMs THEN $reopen
        WHEN acc.st = 0 AND acc.c = 0 AND ($pred0) THEN $enter0
        $branches
        ELSE acc END"""
  }

  /** [[patternMatches]] with PER-STAGE QUANTIFIERS — Flink-CEP's `times(n)`,
    * `times(m, n)` and `oneOrMore`/`timesOrMore` looping stages, closing the
    * pattern-surface gap the plain one-event-per-stage automaton leaves.
    * Each pattern entry is (type, min, max): the stage matches when its type
    * has occurred `min..max` times ([[Unbounded]] max = `oneOrMore` semantics
    * with a floor). `patternMatches` is exactly the all-(t,1,1) special case.
    *
    * Contiguity and determinism, pinned against Flink's defaults:
    *   - RELAXED contiguity within and between stages (Flink's default for
    *     `followedBy` chains and for looping stages — non-matching events
    *     are ignored, they do not end a loop);
    *   - GREEDY loops: Flink's default `oneOrMore` is non-deterministic —
    *     it branches the NFA and (under SKIP_PAST_LAST_ROW) would emit the
    *     run variant the skip strategy leaves alive; this operator pins the
    *     deterministic `greedy()` reading: while the current stage can
    *     still accept (count < max), an event matching BOTH the loop and
    *     the following stage's type EXTENDS the loop rather than advancing.
    *     A stage advances only on an event its own type cannot consume;
    *     with distinct types per stage greedy and lazy coincide, so the
    *     choice only shows on adjacent same-type stages.
    *     MIGRATION NOTE for Flink porters: when an optional/loop stage's
    *     type (or predicate) OVERLAPS the next stage's, the deterministic
    *     greedy reading can emit fewer matches than Flink's branching
    *     NFA — e.g. (view)(click optional)(click) on input `view, click`
    *     emits nothing here (the click greedily fills the optional slot;
    *     the required final click never arrives) where Flink's NFA also
    *     explores the skip branch and matches. Pinned deliberately
    *     (CepSpec "optional loop with a floor elsewhere"); if you need
    *     the skip-branch match, drop the optional stage or give the two
    *     stages disjoint predicates;
    *   - AFTER MATCH SKIP PAST LAST ROW + the NFA timeout convention
    *     (span >= `withinMs` abandons; the abandoning event may re-open);
    *   - MIDDLE stages may be OPTIONAL (min 0 — Flink's `optional()`,
    *     including min-0 unbounded loops): an event matching a later
    *     stage's type advances directly over any run of optional stages;
    *     greedy prefers MATCHING an optional stage over skipping it (the
    *     advance tries targets in order). The first stage stamps the
    *     match start and the last emits, so both need min >= 1;
    *   - the FINAL stage must be an exact count (min == max): a greedy
    *     unbounded last stage never knows it is done inside an unbounded
    *     input — Flink ends such loops with `until()` or the window edge;
    *     bound it (or add a terminal stage) instead.
    *
    * `until()` itself is DELIBERATELY absent: its Flink role is ending an
    * unbounded LAST-stage loop, which this model forbids; for middle
    * loops, closing the loop early cannot move a match's (start, end) —
    * start is stage 0's first event, end is the final stage's — so the
    * only observable effect would be killing runs still below their
    * floor, and a conditional kill is [[patternMatchesNeg]]'s
    * `notBetween` expressed against the loop. No semantics are lost;
    * one state flag and its corner cases are.
    *
    * Scale shape identical to [[patternMatches]]: type-IN pushed scan, one
    * key shuffle, a row-local fold whose state is (stage, count, start) —
    * the repeat counter is the ONLY addition, so per-key memory is still
    * that key's pattern-event count. Streaming twin:
    * [[graft.streaming.CepStream.attachTimes]] carries the counter across
    * micro-batch boundaries (`CepStreamSpec`).
    *
    * @param pattern (event type, min occurrences, max occurrences) per
    *                stage, min >= 1, max >= min ([[Unbounded]] for no cap)
    * @return (k, match_n, start_tms, end_tms) — the [[patternMatches]]
    *         contract; start = the FIRST loop event of stage 0 */
  def patternMatchesTimes(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[(String, Int, Int)],
      withinMs: Long): DataFrame = {
    validateTimes(pattern, withinMs)
    val proj = projEvents(
      df.filter(typeCol.isin(pattern.map(_._1).distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj) match {
      case Some(t) => return t.times(pattern, withinMs)
      case None =>
    }
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 'c', 0, 't0', CAST(0 AS BIGINT),
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${timesFoldStep(pattern, withinMs)},
      acc -> acc.ms)"""
    df.filter(typeCol.isin(pattern.map(_._1).distinct: _*))
      .select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
        ordCol.cast("long").as("oid"), typeCol.as("ty"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("tms"), col("oid"), col("ty"))))
        .as("evs"))
      .select(col("k"), posexplode(expr(fold)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }

  /** [[patternMatchesTimes]]' BRANCHING-NFA opt-in (round 13, VERDICT
    * r12 item 5) — for the [[overlapWarnings]] class: a pattern whose
    * optional/flexible stage shares its type with the next stage loses
    * matches under the deterministic greedy reading (the skip branch is
    * never explored — CepSpec pins the no-match). This form explores
    * EVERY branch at a choice point ([[NfaStepper]]: extend AND all
    * reachable advances fork; branches share the run's start) and emits
    * at the family's EARLIEST completion, then resets (skip past last
    * row — the same after-match stance as the greedy form, so the two
    * differ ONLY where the warning fires; on choice-free patterns they
    * coincide, spec-pinned). Branch-set state is bounded by Σ stage
    * max-counts per key, not by events.
    *
    * Routable keys only (integral/string — the
    * [[patternMatchesSelect]] stance): a branching SQL fold would carry
    * a branch SET in the accumulator, the exact quadratic shape round
    * 12 retired. */
  def patternMatchesTimesNfa(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[(String, Int, Int)],
      withinMs: Long): DataFrame = {
    validateTimes(pattern, withinMs, warnOverlap = false)
    val proj = projEvents(
      df.filter(typeCol.isin(pattern.map(_._1).distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj).getOrElse(throw new IllegalArgumentException(
      s"patternMatchesTimesNfa needs an integral or string key; " +
        s"got ${proj.schema("k").dataType.catalogString} — cast to a " +
        "BIGINT/STRING surrogate")).timesNfa(pattern, withinMs)
  }

  /** Flink-CEP `until(condition)` on the class that needs it — a GREEDY
    * UNBOUNDED FINAL loop closed by a stop-condition event
    * ([[UntilStepper]]): the final stage is `(type, min, Unbounded)` and
    * a match EMITS when an `untilType` event arrives with the loop at or
    * above its floor; the until event is NOT part of the match (end =
    * the last accepted loop event), below-floor partials die, window
    * expiry and end-of-input discard (no stop event arrived — Flink
    * without a timeout handler does the same). This lifts exactly the
    * restriction [[validateTimes]] names ("a greedy unbounded last stage
    * never knows it is done; bound it or add a terminal stage") for
    * pipelines whose terminator must NOT be part of the match.
    * VARIABLE GROUP LOOPS (`times(min,max)` over a sub-pattern) remain
    * deliberately absent — each repetition count forks a run in Flink's
    * branching NFA, which the deterministic plans do not express; with
    * until-closed loops shipped, no remaining reference idiom needs them
    * (COVERAGE.md §flink-cep policy).
    *
    * Scale shape identical to [[patternMatchesTimes]]: type-IN pushed
    * scan (pattern types + the until type), one key shuffle, the routed
    * sorted-iterator plan. Routable keys only (integral/string — the
    * [[patternMatchesTimesNfa]] stance). Streaming twin:
    * [[graft.streaming.CepStream.attachUntil]] (the (st, c, t0, te)
    * state crosses micro-batch boundaries, both state APIs).
    *
    * @param pattern leading stages quantified as in
    *                [[patternMatchesTimes]]; the FINAL stage must be
    *                (type, min >= 1, [[Unbounded]])
    * @param untilType the stop-condition event type; must differ from
    *                every stage type
    * @return (k, match_n, start_tms, end_tms) */
  def patternMatchesUntil(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[(String, Int, Int)],
      untilType: String, withinMs: Long): DataFrame = {
    validateUntil(pattern, untilType, withinMs)
    val types = (pattern.map(_._1) :+ untilType).distinct
    val proj = projEvents(df.filter(typeCol.isin(types: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj).getOrElse(throw new IllegalArgumentException(
      s"patternMatchesUntil needs an integral or string key; " +
        s"got ${proj.schema("k").dataType.catalogString} — cast to a " +
        "BIGINT/STRING surrogate")).timesUntil(pattern, withinMs, untilType)
  }

  private[graft] def validateUntil(pattern: Seq[(String, Int, Int)],
      untilType: String, withinMs: Long): Unit = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    pattern.zipWithIndex.foreach { case ((t, mn, mx), i) =>
      val floor = if (i == 0 || i == pattern.length - 1) 1 else 0
      require(mn >= floor && (mx == Unbounded || mx >= math.max(mn, 1)),
        s"stage '$t' needs $floor <= min <= max (max >= 1), got ($mn, $mx)")
    }
    require(pattern.last._3 == Unbounded,
      "the final stage must be an UNBOUNDED loop (max = Unbounded) — " +
        "that is the class until() exists for; a bounded final stage " +
        "belongs to patternMatchesTimes")
    require(!pattern.exists(_._1 == untilType),
      s"until type '$untilType' must differ from every stage type — an " +
        "event cannot both extend a loop and close it")
  }

  /** [[patternMatchesTimes]] with CONSECUTIVE loops — Flink-CEP's
    * `consecutive()` on `times`/`oneOrMore` stages: WITHIN a stage in
    * `consecutive`, matching events must be strictly adjacent in the
    * key's event sequence — any other event BREAKS the loop. Between
    * stages contiguity stays relaxed (`followedBy`), exactly Flink's
    * scoping. The deterministic reading (the greedy stance of
    * [[patternMatchesTimes]], extended):
    *
    *   - a break while the loop is below its floor (count < min) KILLS
    *     the partial — the breaking event may itself reopen a stage-0
    *     run;
    *   - a break at or above the floor CLOSES the loop (no further
    *     extension) and the partial waits relaxed for the next stage —
    *     the longest-unbroken-run determinization of Flink's branching
    *     NFA (which would also explore shorter stopped-earlier runs).
    *
    * Scale/cost: like [[patternMatchesNext]], the scan CANNOT pre-filter
    * to pattern types — ANY event can break a loop, so every event of
    * the key is state-relevant (the semantic price of strictness; use
    * plain relaxed loops wherever the query allows). One key shuffle,
    * the typed sorted-iterator plan (integral/string keys only — no SQL
    * fold twin; the oracle is a recursive CTE with the closed flag).
    * Streaming twin: [[graft.streaming.CepStream.attachTimesConsecutive]]
    * (the closed flag crosses micro-batch boundaries).
    *
    * @param consecutive stage indices (0-based) whose loops are
    *                    consecutive; must be non-empty — with none, use
    *                    [[patternMatchesTimes]] (pre-filtered scan)
    * @return (k, match_n, start_tms, end_tms) — the [[patternMatches]]
    *         contract */
  def patternMatchesTimesConsecutive(df: DataFrame, keyCol: Column,
      tsMsCol: Column, ordCol: Column, typeCol: Column,
      pattern: Seq[(String, Int, Int)], withinMs: Long,
      consecutive: Set[Int]): DataFrame = {
    validateTimes(pattern, withinMs)
    require(consecutive.nonEmpty,
      "no consecutive stages — use patternMatchesTimes (pre-filtered scan)")
    require(consecutive.forall(i => i >= 0 && i < pattern.length),
      s"consecutive stages must be in 0..${pattern.length - 1}")
    // NO type pre-filter: any event can break a consecutive loop
    val proj = projEvents(df, keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj).getOrElse(throw new IllegalArgumentException(
        "patternMatchesTimesConsecutive runs on the typed sorted-iterator " +
          "plan — the key column must be an integral or string type, got " +
          proj.schema("k").dataType.catalogString))
      .timesConsecutive(pattern, withinMs, consecutive)
  }

  /** [[patternMatches]] with MATCH-PAYLOAD OUTPUT — Flink-CEP's
    * `select`/`flatSelect` surface: the `PatternSelectFunction` hands the
    * user the MATCHED EVENTS per stage ("which click converted"), not just
    * the match's (start, end) envelope. One output row per matched stage
    * event, long format (scalar columns, engine-portable for the oracle
    * hash): a 3-stage match emits 3 rows sharing (k, match_n).
    *
    * Semantics are [[patternMatches]]' exactly (relaxed contiguity, NFA
    * timeout at span >= window, skip past last row, greedy earliest
    * start) — only the emission changes; `(k, match_n,
    * min(ev_tms)..max(ev_tms))` reproduces the envelope operator's rows.
    *
    * State stays O(pattern) per key: the partial match buffers exactly
    * one (tms, oid) per matched stage — bounded by pattern length, NOT
    * Flink's per-stage event buffers (which an unbounded loop would grow
    * with); this is why the select surface is offered on the
    * one-event-per-stage class. Runs on the typed sorted-iterator plan
    * ([[TypedCep.select]] — spill-safe, no per-key array), so the key
    * column must be an integral or string type (it has no SQL-fold twin).
    *
    * @return (k, match_n, stage_n, ev_tms, ev_oid) — stage_n numbered
    *         1..pattern.length; ev_oid is the matched event's `ordCol` */
  def patternMatchesSelect(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val proj = projEvents(df.filter(typeCol.isin(pattern.distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj).getOrElse(throw new IllegalArgumentException(
        "patternMatchesSelect runs on the typed sorted-iterator plan — " +
          "the key column must be an integral or string type, got " +
          proj.schema("k").dataType.catalogString))
      .select(pattern, withinMs)
  }

  /** [[patternMatchesTimes]] with PREDICATE stages — Flink-CEP's `where()`
    * conditions: each stage matches an arbitrary SQL boolean over the
    * event, not a type label (type equality is just one predicate). The
    * event struct `e` carries `tms`, `oid`, and every caller-declared
    * `payload` column by name, so a stage can read any event field:
    *
    * {{{
    * Cep.patternMatchesWhere(df, $"user_id", unix_millis($"ts"),
    *   $"event_id",
    *   stages = Seq(("e.ty = 'view' AND e.value > 60.0", 1, 1),
    *                ("e.ty = 'purchase' AND e.value > 120.0", 1, 1)),
    *   withinMs = 7L * 86400000,
    *   payload = Seq("ty" -> $"event_type", "value" -> $"value"))
    * }}}
    *
    * Semantics are [[patternMatchesTimes]]' exactly (greedy loops, relaxed
    * contiguity, exact-count final stage, NFA timeout, skip past last
    * row) — the fold step is shared, with predicates in place of the
    * type-equality tests, so the two operators cannot drift.
    *
    * Scale note: the scan is NOT pre-filtered here — predicates are
    * opaque SQL. Relaxed contiguity ignores events matching no stage, so
    * filtering the input to the UNION of the stage predicates is always
    * semantics-preserving; do it at the call site (the `q_cep_where`
    * query pushes the implied type IN) to keep the pushdown.
    *
    * Overlapping predicates and greedy: if an event satisfies BOTH the
    * live stage's predicate (loop can still accept) and the next
    * stage's, the loop consumes it — [[patternMatchesTimes]]' adjacent
    * same-type rule generalized.
    *
    * Physical plan: for integral/string keys the stage predicates
    * are PRECOMPUTED per event — evaluated once, columnar and codegen'd,
    * before the key shuffle — and the spill-safe sorted-iterator
    * automaton ([[TypedCep.pred]]) reads booleans only; the
    * row-local `aggregate` fold below serves other key types. The fold
    * is also QUADRATIC IN COPY WORK on a celebrity key (Catalyst's
    * ArrayAggregate copies the accumulator — including the grown match
    * array — per element; measured in ScaleProbe `cephot`), which is
    * why the routed plan is the default, not just a memory nicety.
    *
    * @param stages  (SQL boolean over `e`, min, max) per stage
    * @param payload (field name, source column) — names
    *                `k`/`tms`/`oid`/`e` are reserved
    * @return (k, match_n, start_tms, end_tms) — the [[patternMatches]]
    *         contract */
  def patternMatchesWhere(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, stages: Seq[(String, Int, Int)], withinMs: Long,
      payload: Seq[(String, Column)]): DataFrame = {
    validateTimes(stages, withinMs)
    require(!payload.exists(p =>
        p._1 == "k" || p._1 == "tms" || p._1 == "oid" || p._1 == "e"),
      "payload field names k/tms/oid/e are reserved")
    require(payload.map(_._1).distinct.length == payload.length,
      "payload field names must be unique")
    val projected = df.select(Seq(keyCol.as("k"),
        tsMsCol.cast("long").as("tms"), ordCol.cast("long").as("oid")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
    // PRECOMPUTED-PREDICATE sorted plan: where-predicates are per-event
    // SQL booleans, so they evaluate ONCE — columnar, codegen'd, before
    // the key shuffle — into a ps array; the spill-safe sorted-iterator
    // automaton then reads booleans only. A NULL predicate result is
    // "not matched" (the fold's CASE semantics), hence the coalesce.
    val withPs = projected
      .withColumn("e", struct(Seq(col("tms"), col("oid")) ++
        payload.map(p => col(p._1)): _*))
      .select(col("k"), col("tms"), col("oid"),
        array(stages.map(s =>
          coalesce(expr(s._1).cast("boolean"), lit(false))): _*).as("ps"))
    typedCep(withPs) match {
      case Some(t) => return t.pred(stages.map(s => (s._2, s._3)), withinMs)
      case None =>
    }
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 'c', 0, 't0', CAST(0 AS BIGINT),
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${timesFoldStepPred(stages, withinMs)},
      acc -> acc.ms)"""
    val fields = Seq(col("tms"), col("oid")) ++ payload.map(p => col(p._1))
    df.select(Seq(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
        ordCol.cast("long").as("oid")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
      .groupBy("k")
      .agg(sort_array(collect_list(struct(fields: _*))).as("evs"))
      .select(col("k"), posexplode(expr(fold)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }

  /** [[patternMatchesWhere]] with ITERATIVE conditions — Flink-CEP's
    * `IterativeCondition`, scoped to the reference every funnel-style
    * query actually uses: a stage predicate may reference the event that
    * OPENED the match as `first.<field>` (stage 0's first event — Flink's
    * `ctx.getEventsForPattern(<begin>).iterator().next()`):
    *
    * {{{
    * // purchases at least double the opening view's value
    * Cep.patternMatchesIter(df, $"user_id", unix_millis($"ts"),
    *   $"event_id",
    *   stages = Seq(("e.ty = 'view'", 1, 1),
    *                ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1)),
    *   withinMs = 7L * 86400000,
    *   payload = Seq("ty" -> $"event_type", "value" -> $"value"))
    * }}}
    *
    * Implementation: the fold state captures the opening event's payload
    * fields into an `f0` struct (types derived from the projected
    * schema), and `first.` rewrites to `acc.f0.` inside the shared step
    * — semantics otherwise [[patternMatchesTimes]]' exactly (greedy,
    * relaxed, optional stages, exact final count, NFA timeout, skip past
    * last row). State stays O(1) per key: one captured event, not
    * Flink's full per-stage event buffers — which is why only `first.`
    * is offered; arbitrary `getEventsForPattern` over an unbounded loop
    * would grow keyed state with the loop.
    *
    * Stage 0 cannot reference `first.` (nothing is captured yet); the
    * scan is the caller's to pre-filter, as in [[patternMatchesWhere]].
    *
    * Physical plan (round 12): integral and string keys run on the typed
    * sorted-iterator plan ([[TypedCep.iter]]) — a `first.*` predicate
    * depends on the run's captured state, so it cannot be precomputed
    * per event the way [[patternMatchesWhere]]'s stages are; instead the
    * stage predicates are parsed and analyzed ONCE by the session's own
    * analyzer (same resolution and coercion as the SQL fold) into bound
    * Catalyst predicates evaluated row-at-a-time inside the streamed
    * group, with the captured opener threaded as the `first` struct.
    * Spill-safe, O(pattern) per-key state — no per-key array, no
    * quadratic accumulator copies. Other key types keep the row-local
    * fold, whose celebrity-key caveat applies (ScaleProbe `cephot`).
    *
    * @return (k, match_n, start_tms, end_tms) — the [[patternMatches]]
    *         contract */
  def patternMatchesIter(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, stages: Seq[(String, Int, Int)], withinMs: Long,
      payload: Seq[(String, Column)]): DataFrame = {
    validateTimes(stages, withinMs)
    require(!payload.exists(p =>
        p._1 == "k" || p._1 == "tms" || p._1 == "oid" || p._1 == "e"),
      "payload field names k/tms/oid/e are reserved")
    require(payload.map(_._1).distinct.length == payload.length,
      "payload field names must be unique")
    require(!existsOutsideLiterals(stages.head._1, "(?s).*\\bfirst\\..*"),
      "stage 0 cannot reference first.* — nothing is captured yet")
    val projected = df.select(Seq(keyCol.as("k"),
        tsMsCol.cast("long").as("tms"), ordCol.cast("long").as("oid")) ++
        payload.map { case (n, c) => c.as(n) }: _*)
    typedCep(projected) match {
      case Some(t) => return t.iter(stages, withinMs, payload.map(_._1))
      case None =>
    }
    val capture = payload.map { case (n, _) =>
      n -> projected.schema(n).dataType.catalogString }
    val rewritten = stages.map { case (p, mn, mx) =>
      (mapOutsideLiterals(p)(_.replaceAll("\\bfirst\\.", "acc.f0.")), mn, mx) }
    val nullF0 = s"CAST(NULL AS struct<${capture
      .map { case (n, t) => s"$n: $t" }.mkString(", ")}>)"
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 'c', 0, 't0', CAST(0 AS BIGINT), 'f0', $nullF0,
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${timesFoldStepPred(rewritten, withinMs, capture)},
      acc -> acc.ms)"""
    val fields = Seq(col("tms"), col("oid")) ++ payload.map(p => col(p._1))
    projected
      .groupBy("k")
      .agg(sort_array(collect_list(struct(fields: _*))).as("evs"))
      .select(col("k"), posexplode(expr(fold)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }

  /** [[patternMatches]] under AFTER MATCH SKIP TO NEXT ROW — the other end
    * of Flink's skip-strategy spectrum: matches may OVERLAP; every stage-0
    * event starts its own run, and each run emits its EARLIEST completion
    * within the window (or nothing). For a fixed one-event-per-stage
    * pattern the runs never interact: runs advance monotonically (an
    * earlier-started run is always at a stage >= a later-started one, since
    * both see the same suffix of events), so SKIP_TO_NEXT's "discard runs
    * that started with the emitted match's first event" reduces to
    * per-start independence — which is what this computes directly.
    *
    * Cost model (the honest price of overlap, mirroring Flink's concurrent
    * NFA runs): the typed sorted-iterator plan (integral/string keys —
    * [[TypedCep.skipNext]], the shared [[SkipStepper]]) is ONE pass over
    * each key's sorted pattern events with the ACTIVE RUN SET as state:
    * O(events × live runs) work and O(in-window stage-0 events) peak
    * state per key — linear again when the window bounds concurrent
    * starts, and never materializing the key's event array (hot-key
    * probe: ScaleProbe `skipnexthot`, flat to 10 M one-key events).
    * Other key types keep the static-unroll fold below: per key
    * O(starts × stages × events) worst case over a `collect_list` array —
    * each stage-0 event walks forward once per stage. Either way the scan
    * pre-filters to pattern types and shuffles once on the key. Use SKIP
    * PAST LAST ROW wherever the query allows.
    *
    * @return (k, match_n, start_tms, end_tms); match_n numbers runs per key
    *         by start order — matches may overlap in time */
  def patternMatchesSkipNext(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    val proj = projEvents(df.filter(typeCol.isin(pattern.distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj) match {
      case Some(t) => return t.skipNext(pattern, withinMs)
      case None =>
    }
    // per start s0 (0-based index into the sorted event array): thread the
    // position through the remaining stages via an aggregate over the stage
    // literals, so each stage's forward scan runs ONCE (a nested textual
    // expansion would re-evaluate the previous position per element —
    // O(n²) per stage). A stage with no within-window occurrence after the
    // current position nulls the accumulator and the IF short-circuits the
    // rest. get() is the non-ANSI 0-based accessor — out of bounds or a
    // null index is NULL, never an error.
    val stagesArr = pattern.tail.map(esc).mkString("array(", ", ", ")")
    val walk =
      if (pattern.tail.isEmpty) "CAST(s0 AS INT)"
      else s"""aggregate($stagesArr, CAST(s0 AS INT),
        (pos, t) -> IF(pos IS NULL, CAST(NULL AS INT),
          get(filter(transform(evs, (e2, j) -> IF(j > pos AND e2.ty = t
            AND e2.tms - get(evs, s0).tms < $withinMs, j, -1)),
            x -> x >= 0), 0)))"""
    val runs = s"""filter(transform(
        filter(transform(evs, (e, i) -> IF(e.ty = ${esc(pattern.head)}, i, -1)),
          x -> x >= 0),
        s0 -> named_struct('s', get(evs, s0).tms,
                           'e', get(evs, $walk).tms)),
      m -> m.e IS NOT NULL)"""
    df.filter(typeCol.isin(pattern.distinct: _*))
      .select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
        ordCol.cast("long").as("oid"), typeCol.as("ty"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("tms"), col("oid"), col("ty"))))
        .as("evs"))
      .select(col("k"), posexplode(expr(runs)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }

  /** [[patternMatches]] under AFTER MATCH SKIP TO FIRST / SKIP TO LAST —
    * the remaining members of Flink's AfterMatchSkipStrategy enum (they
    * COINCIDE on the one-event-per-stage class this operator serves:
    * each stage matches exactly one event, so a stage's first and last
    * event are the same). A single greedy run as in [[patternMatches]],
    * but after a match completes the scan RESUMES AT the match's
    * stage-`skipToStage` event (inclusive) — matches may overlap, less
    * aggressively than [[patternMatchesSkipNext]]'s every-start runs,
    * more than skip-past-last-row's none:
    *
    *   - `skipToStage` = 1 on (view, click, purchase) re-scans from the
    *     matched click — a purchase can close a second funnel whose
    *     click the first funnel consumed;
    *   - `skipToStage` = 0 is REJECTED: resuming at the match's own
    *     first event loops forever (Flink's SKIP_TO_FIRST[begin] throws
    *     the same way).
    *
    * Cost model: one pass per key over the sorted pattern events with
    * O(one partial's in-window span) buffered while a partial is at or
    * beyond stage `skipToStage` (replayed once per emitted match) — the
    * window-bounded class, never a per-key event array. Runs on the
    * typed sorted-iterator plan, so the key must be an integral or
    * string type (no SQL-fold twin; the DuckDB oracle is a
    * rewind-position recursive CTE). Streaming twin:
    * [[graft.streaming.CepStream.attachSkipTo]] persists (stage, start,
    * buffer) across micro-batches.
    *
    * @param skipToStage 1..pattern.length-1: the stage whose matched
    *                    event the scan resumes at after each match
    * @return (k, match_n, start_tms, end_tms); match_n numbers matches
    *         per key in emission order — starts strictly increase */
  def patternMatchesSkipTo(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long, skipToStage: Int): DataFrame = {
    require(pattern.length >= 2,
      "skip-to-first/last needs at least two stages — with one stage " +
        "every skip strategy coincides with skip past last row")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    require(skipToStage >= 1 && skipToStage < pattern.length,
      s"skipToStage must be in 1..${pattern.length - 1} (0 would resume " +
        "at the match's own first event and loop forever — Flink's " +
        s"SKIP_TO_FIRST[begin] rejection), got $skipToStage")
    val proj = projEvents(df.filter(typeCol.isin(pattern.distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(proj).getOrElse(throw new IllegalArgumentException(
        "patternMatchesSkipTo runs on the typed sorted-iterator plan — " +
          "the key column must be an integral or string type, got " +
          proj.schema("k").dataType.catalogString))
      .skipTo(pattern, withinMs, skipToStage)
  }

  /** [[patternMatches]] with STRICT CONTIGUITY — Flink-CEP's `next` and
    * `notNext`, completing the primitive set (begin/followedBy/
    * notFollowedBy being the others):
    *
    *   - stages in `nextStages` must be matched by the key's IMMEDIATELY
    *     following event, so ANY intervening event — pattern-typed or not
    *     — kills the partial (the killing event may itself re-open a
    *     stage-0 partial; relaxed stages keep [[patternMatches]]' ignore
    *     semantics);
    *   - `notNext(i)` bans types from the IMMEDIATELY-following slot
    *     after stage i−1 matched: a banned very-next event kills the
    *     partial, any OTHER very-next event discharges the ban and the
    *     run continues waiting (relaxed) for stage i — Flink's
    *     `A.notNext(B).followedBy(C)`. The ban is checked before the
    *     stage advance (negation guards the slot), and is meaningless on
    *     a strict stage (strict already kills every non-match) — the two
    *     sets must be disjoint.
    *
    * Same timeout convention (span >= withinMs abandons). Cost model is
    * the semantic price of strictness: the scan CANNOT pre-filter to
    * pattern types (any event breaks adjacency / consumes the notNext
    * slot, so it must reach the fold) — each key folds over its FULL
    * event sequence, where the relaxed operator folds over its pattern
    * events only. Use relaxed stages wherever the query allows.
    *
    * Plan routing (round 10, `ScaleProbe cepnext`): the common `A next B`
    * case (exactly two stages, both-strict chain, no bans, distinct
    * types) is served by a WINDOW-LEAD plan instead of the array fold —
    * an adjacent (A, B) pair with gap < window IS the match, matches
    * cannot overlap when the types differ, and the streaming window sort
    * measured ~4× faster than collect_list+fold at EVERY pattern-event
    * fraction (5–90%, 16 M rows — no crossover; see SCALING.md). The
    * window also spills gracefully where the fold pins each key's event
    * array. General patterns keep the fold ([[patternMatchesNextFold]]).
    *
    * @param nextStages stage indices (1..pattern.length-1) whose match
    *                   must be strictly adjacent to the previous stage's
    * @param notNext    stage index (1..pattern.length-1) → types banned
    *                   from the slot immediately after stage i−1's match
    * @return (k, match_n, start_tms, end_tms) — the [[patternMatches]]
    *         contract */
  def patternMatchesNext(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long, nextStages: Set[Int],
      notNext: Map[Int, Seq[String]] = Map.empty): DataFrame = {
    if (pattern.length == 2 && nextStages == Set(1) && notNext.isEmpty &&
        pattern.head != pattern(1)) {
      require(withinMs > 0, s"withinMs must be positive, got $withinMs")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("k"))
        .orderBy(col("tms"), col("oid"), col("ty"))
      return df
        .select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
          ordCol.cast("long").as("oid"), typeCol.as("ty"))
        .withColumn("nty", lead(col("ty"), 1).over(w))
        .withColumn("ntms", lead(col("tms"), 1).over(w))
        .filter(col("ty") === pattern.head && col("nty") === pattern(1) &&
          col("ntms") - col("tms") < withinMs)
        .select(col("k"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("tms"), col("oid")))
            .as("match_n"),
          col("tms").as("start_tms"), col("ntms").as("end_tms"))
    }
    patternMatchesNextFold(df, keyCol, tsMsCol, ordCol, typeCol, pattern,
      withinMs, nextStages, notNext)
  }

  /** The strict/notNext automaton's step as a SQL `(acc, e) -> CASE...`
    * lambda over state (st INT, t0 BIGINT, fr BOOLEAN, ms ARRAY) — shared
    * between the batch fold (zero-seeded) and
    * [[graft.streaming.IncrementalCep.foldBatchNext]] (seeded from the
    * persistent per-key state), so the two can never drift branch-wise.
    * 'fr' = stage just matched, no event consumed since (the notNext
    * slot is open). */
  private[graft] def nextFoldStep(pattern: Seq[String], withinMs: Long,
      nextStages: Set[Int], notNext: Map[Int, Seq[String]]): String = {
    val last = pattern.length - 1
    val stageMatch = pattern.zipWithIndex
      .map { case (t, i) => s"WHEN acc.st = $i THEN e.ty = ${esc(t)}" }
      .mkString("CASE ", " ", " ELSE false END")
    val start = "IF(acc.st = 0, e.tms, acc.t0)"
    val emit = s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), " +
      s"'fr', false, " +
      s"'ms', array_append(acc.ms, named_struct('s', $start, 'e', e.tms)))"
    val advance = s"CASE WHEN acc.st = $last THEN $emit " +
      s"ELSE named_struct('st', acc.st + 1, 't0', $start, 'fr', true, " +
      s"'ms', acc.ms) END"
    val reopen = s"IF(e.ty = ${esc(pattern.head)}, " +
      s"named_struct('st', 1, 't0', e.tms, 'fr', true, 'ms', acc.ms), " +
      s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), 'fr', false, " +
      s"'ms', acc.ms))"
    val strictBreak =
      if (nextStages.isEmpty) "false"
      else s"acc.st IN (${nextStages.toSeq.sorted.mkString(", ")})"
    val notNextKills = notNext.toSeq.sortBy(_._1).map { case (i, ts) =>
      s"WHEN acc.fr AND acc.st = $i AND " +
        s"e.ty IN (${ts.map(esc).mkString(", ")}) THEN $reopen"
    }.mkString(" ")
    s"""(acc, e) -> CASE
        WHEN acc.st > 0 AND e.tms - acc.t0 >= $withinMs THEN $reopen
        $notNextKills
        WHEN $stageMatch THEN $advance
        WHEN $strictBreak THEN $reopen
        ELSE named_struct('st', acc.st, 't0', acc.t0, 'fr', false,
          'ms', acc.ms) END"""
  }

  /** The NEGATION automaton's step as a SQL lambda over state (st INT,
    * t0 BIGINT, te BIGINT, ms ARRAY) — st = pattern.length means
    * "watching the trailing ban". Shared between the batch fold and
    * [[graft.streaming.IncrementalCep.foldBatchNeg]]; the batch fold's
    * input-end flush (a live watch emits) becomes the store-backed
    * drive's [[graft.streaming.IncrementalCep.flushBatchNeg]]. */
  private[graft] def negFoldStep(pattern: Seq[String], withinMs: Long,
      notBetween: Map[Int, Seq[String]], notAfter: Seq[String]): String = {
    val last = pattern.length - 1
    val watch = pattern.length
    val hasTrailing = notAfter.nonEmpty
    def inSet(ts: Seq[String]) = s"e.ty IN (${ts.map(esc).mkString(", ")})"
    def reopen(ms: String) = s"IF(e.ty = ${esc(pattern.head)}, " +
      s"named_struct('st', ${if (last == 0 && hasTrailing) watch else math.min(1, last + 1)}, " +
      s"'t0', e.tms, 'te', e.tms, 'ms', $ms), " +
      s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), " +
      s"'te', CAST(0 AS BIGINT), 'ms', $ms))"
    val emitMs = "array_append(acc.ms, named_struct('s', acc.t0, 'e', acc.te))"
    val stageMatch = pattern.zipWithIndex
      .map { case (t, i) => s"WHEN acc.st = $i THEN e.ty = ${esc(t)}" }
      .mkString("CASE ", " ", " ELSE false END")
    val start = "IF(acc.st = 0, e.tms, acc.t0)"
    val complete =
      if (hasTrailing)
        s"named_struct('st', $watch, 't0', $start, 'te', e.tms, 'ms', acc.ms)"
      else s"named_struct('st', 0, 't0', CAST(0 AS BIGINT), " +
        s"'te', CAST(0 AS BIGINT), 'ms', " +
        s"array_append(acc.ms, named_struct('s', $start, 'e', e.tms)))"
    val advance = s"CASE WHEN acc.st = $last THEN $complete " +
      s"ELSE named_struct('st', acc.st + 1, 't0', $start, 'te', " +
      s"CAST(0 AS BIGINT), 'ms', acc.ms) END"
    val betweenKills = notBetween.toSeq.sortBy(_._1).map { case (i, ts) =>
      s"WHEN acc.st = $i AND ${inSet(ts)} THEN ${reopen("acc.ms")}"
    }.mkString(" ")
    val watchArm = if (!hasTrailing) "" else
      s"""WHEN acc.st = $watch THEN CASE
            WHEN e.tms - acc.t0 >= $withinMs THEN ${reopen(emitMs)}
            WHEN ${inSet(notAfter)} THEN ${reopen("acc.ms")}
            ELSE acc END"""
    s"""(acc, e) -> CASE
        $watchArm
        WHEN acc.st > 0 AND e.tms - acc.t0 >= $withinMs THEN ${reopen("acc.ms")}
        $betweenKills
        WHEN $stageMatch THEN $advance
        ELSE acc END"""
  }

  /** The general strict/notNext automaton fold — [[patternMatchesNext]]
    * routes here for every shape the window-lead plan can't express. */
  private[graft] def patternMatchesNextFold(df: DataFrame, keyCol: Column,
      tsMsCol: Column, ordCol: Column, typeCol: Column,
      pattern: Seq[String], withinMs: Long, nextStages: Set[Int],
      notNext: Map[Int, Seq[String]] = Map.empty): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    require(nextStages.nonEmpty || notNext.nonEmpty,
      "no strict stages and no notNext bans — use patternMatches " +
        "(pre-filtered scan) or patternMatchesNeg")
    require(nextStages.forall(i => i >= 1 && i < pattern.length),
      s"nextStages must be in 1..${pattern.length - 1}")
    require(notNext.keys.forall(i => i >= 1 && i < pattern.length),
      s"notNext stages must be in 1..${pattern.length - 1}")
    require(notNext.keySet.intersect(nextStages).isEmpty,
      "a stage cannot be both strict and notNext-banned — strict " +
        "already kills every non-matching very-next event")
    // integral/string keys stream through the sorted-iterator plan (the
    // scan stays UNFILTERED — strict adjacency needs every event); the
    // fold below serves other key types
    val projN = projEvents(df, keyCol, tsMsCol, ordCol, typeCol)
    typedCep(projN) match {
      case Some(t) => return t.strict(pattern, withinMs, nextStages, notNext)
      case None =>
    }
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 't0', CAST(0 AS BIGINT), 'fr', false,
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${nextFoldStep(pattern, withinMs, nextStages, notNext)},
      acc -> acc.ms)"""
    // NO type pre-filter: strict adjacency makes every event of the key
    // state-relevant (P = 1 degenerates to no strict stages — rejected)
    df.select(keyCol.as("k"), tsMsCol.cast("long").as("tms"),
        ordCol.cast("long").as("oid"), typeCol.as("ty"))
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("tms"), col("oid"), col("ty"))))
        .as("evs"))
      .select(col("k"), posexplode(expr(fold)).as(Seq("i", "m")))
      .select(col("k"), (col("i") + 1).as("match_n"),
        col("m.s").as("start_tms"), col("m.e").as("end_tms"))
  }

  /** [[patternMatches]] with NEGATION — Flink-CEP's `notFollowedBy`, the
    * other half of the pattern surface, in both positions it can appear:
    *
    *   - BETWEEN stages (`notBetween(i)` = types banned after stage i−1
    *     matched, while waiting for stage i): a banned event KILLS the
    *     partial (the killing event may itself re-open a stage-0 partial);
    *     a type that is both banned and the expected stage kills — the
    *     negation guards the gap, so it is checked first;
    *   - TRAILING (`notAfter`, Flink's `notFollowedBy(...).within(...)`
    *     terminal form): completing the last positive stage opens a WATCH
    *     until `start + withinMs`; a banned event inside the window
    *     discards the pending match, the window expiring (the next event
    *     at `span >= withinMs`, or the key's input ending — batch input
    *     end means the banned event never comes) emits it. Matches still
    *     never overlap: the watch occupies the automaton (skip past last
    *     row counts the watched events as consumed).
    *
    * Same timeout convention as [[patternMatches]] (span >= withinMs
    * abandons — Flink NFA parity) and the same scale shape: the scan
    * pre-filter widens to pattern ∪ banned types (banned events change
    * state, so they must reach the fold — still one pushable IN), one key
    * shuffle, a row-local fold. Streaming twin:
    * [[graft.streaming.CepStream.attachNeg]] (event-time timeout emits
    * the watch where batch input end does).
    *
    * @param notBetween stage index i (1..pattern.length-1) → banned types
    *                   while waiting for stage i
    * @param notAfter   types banned between the final stage and window end
    * @return (k, match_n, start_tms, end_tms) — end_tms = the final
    *         POSITIVE stage's timestamp */
  def patternMatchesNeg(df: DataFrame, keyCol: Column, tsMsCol: Column,
      ordCol: Column, typeCol: Column, pattern: Seq[String],
      withinMs: Long, notBetween: Map[Int, Seq[String]] = Map.empty,
      notAfter: Seq[String] = Seq.empty): DataFrame = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be positive, got $withinMs")
    require(notBetween.keys.forall(i => i >= 1 && i < pattern.length),
      s"notBetween stages must be in 1..${pattern.length - 1}")
    // integral/string keys stream through the sorted-iterator plan (same
    // widened pattern ∪ banned pre-filter — banned events change state);
    // the fold below serves other key types
    val projB = projEvents(
      df.filter(typeCol.isin(
        (pattern ++ notBetween.values.flatten ++ notAfter).distinct: _*)),
      keyCol, tsMsCol, ordCol, typeCol)
    typedCep(projB) match {
      case Some(t) => return t.neg(pattern, withinMs, notBetween, notAfter)
      case None =>
    }
    val watch = pattern.length // st value while watching the trailing ban
    val emitMs = "array_append(acc.ms, named_struct('s', acc.t0, 'e', acc.te))"
    // input-end flush: a live watch emits (the banned event never came)
    val finish = if (notAfter.isEmpty) "acc -> acc.ms"
      else s"acc -> IF(acc.st = $watch, $emitMs, acc.ms)"
    val fold = s"""aggregate(evs,
      named_struct('st', 0, 't0', CAST(0 AS BIGINT), 'te', CAST(0 AS BIGINT),
        'ms', CAST(array() AS array<struct<s: bigint, e: bigint>>)),
      ${negFoldStep(pattern, withinMs, notBetween, notAfter)},
      $finish)"""
    val allTypes =
      (pattern ++ notBetween.values.flatten ++ notAfter).distinct
    df.filter(typeCol.isin(allTypes: _*))
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

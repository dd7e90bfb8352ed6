package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Batch CEP automaton semantics: relaxed contiguity, within-window
  * timeout, skip-past-last-row, greedy (earliest-start) matching, repeated
  * pattern symbols, single-symbol patterns. */
class CepSpec extends SparkSpec {

  private def ev(rows: (Long, Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.zipWithIndex
      .map { case ((k, t, ty), i) => (k, t, i.toLong, ty) }
      .toDF("k", "tms", "oid", "ty")
  }

  private def matches(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[String], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatches(df, col("k"), col("tms"), col("oid"), col("ty"),
        pattern, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private val vcp = Seq("view", "click", "purchase")

  private def matchesNext(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[String], w: Long, next: Set[Int],
      notNext: Map[Int, Seq[String]] = Map.empty): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesNext(df, col("k"), col("tms"), col("oid"), col("ty"),
        pattern, w, next, notNext)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("strict contiguity: ANY intervening event kills; the breaking view reopens") {
    // view→click with next: error between them breaks the run; the later
    // view→click pair (strictly adjacent) matches
    val broken = ev((1, 10, "view"), (1, 20, "error"), (1, 30, "click"),
      (1, 40, "view"), (1, 50, "click"))
    assert(matchesNext(broken, Seq("view", "click"), 1000, Set(1))
      == Seq((1L, 1, 40L, 50L)))
    // a second view breaks the first run but opens its own, which matches
    val reopened = ev((2, 10, "view"), (2, 20, "view"), (2, 30, "click"))
    assert(matchesNext(reopened, Seq("view", "click"), 1000, Set(1))
      == Seq((2L, 1, 20L, 30L)))
    // mixed contiguity: view followedBy click NEXT purchase — noise
    // allowed before the click, nothing between click and purchase
    val mixed = ev((3, 10, "view"), (3, 20, "error"), (3, 30, "click"),
      (3, 40, "purchase"), (3, 50, "view"), (3, 60, "click"),
      (3, 70, "signup"), (3, 80, "purchase"))
    assert(matchesNext(mixed, vcp, 1000, Set(2))
      == Seq((3L, 1, 10L, 40L)))
    // same events, fully relaxed: both runs complete
    assert(matches(mixed, vcp, 1000)
      == Seq((3L, 1, 10L, 40L), (3L, 2, 50L, 80L)))
  }

  test("notNext: a banned very-next event kills; any other discharges the ban") {
    val vp = Seq("view", "purchase")
    val ban = Map(1 -> Seq("error"))
    // error right after the view kills; signup right after discharges the
    // ban, the later error is then harmless and the purchase completes
    val killed = ev((1, 10, "view"), (1, 20, "error"), (1, 30, "purchase"))
    assert(matchesNext(killed, vp, 1000, Set.empty, ban).isEmpty)
    val discharged = ev((2, 10, "view"), (2, 20, "signup"),
      (2, 30, "error"), (2, 40, "purchase"))
    assert(matchesNext(discharged, vp, 1000, Set.empty, ban)
      == Seq((2L, 1, 10L, 40L)))
    // the killing error cannot reopen (error != view); a later view can
    val reopened = ev((3, 10, "view"), (3, 20, "error"), (3, 30, "view"),
      (3, 40, "purchase"))
    assert(matchesNext(reopened, vp, 1000, Set.empty, ban)
      == Seq((3L, 1, 30L, 40L)))
    // a purchase in the very-next slot is not banned: it both discharges
    // and completes
    val immediate = ev((4, 10, "view"), (4, 20, "purchase"))
    assert(matchesNext(immediate, vp, 1000, Set.empty, ban)
      == Seq((4L, 1, 10L, 20L)))
  }

  test("relaxed contiguity: noise events between stages are ignored") {
    val df = ev((1, 10, "view"), (1, 20, "error"), (1, 30, "click"),
      (1, 40, "signup"), (1, 50, "purchase"))
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 50L)))
  }

  test("out-of-stage pattern events are ignored (purchase before click)") {
    val df = ev((1, 10, "view"), (1, 20, "purchase"), (1, 30, "click"),
      (1, 40, "purchase"))
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 40L)))
  }

  test("greedy earliest start: a second view cannot restart a live partial") {
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "click"),
      (1, 40, "purchase"))
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 40L)))
  }

  test("within: late completion abandons the partial; no match emitted") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 2000, "purchase"))
    assert(matches(df, vcp, 100).isEmpty)
  }

  test("within boundary: a span exactly equal to the window does NOT complete") {
    // Flink-NFA convention: timeout at timestamp - start >= windowTime,
    // so 110 - 10 = 100 with window 100 abandons; 109 completes
    val atBoundary = ev((1, 10, "view"), (1, 20, "click"), (1, 110, "purchase"))
    assert(matches(atBoundary, vcp, 100).isEmpty)
    val inside = ev((1, 10, "view"), (1, 20, "click"), (1, 109, "purchase"))
    assert(matches(inside, vcp, 100) == Seq((1L, 1, 10L, 109L)))
  }

  test("the abandoning event itself starts a new partial when stage-0") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 2000, "view"),
      (1, 2010, "click"), (1, 2020, "purchase"))
    assert(matches(df, vcp, 100) == Seq((1L, 1, 2000L, 2020L)))
  }

  test("skip past last row: back-to-back full runs emit disjoint matches") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
      (1, 40, "view"), (1, 50, "click"), (1, 60, "purchase"))
    assert(matches(df, vcp, 1000) ==
      Seq((1L, 1, 10L, 30L), (1L, 2, 40L, 60L)))
  }

  test("repeated pattern symbols pair greedily without overlap") {
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"),
      (1, 40, "view"))
    assert(matches(df, Seq("view", "view"), 1000) ==
      Seq((1L, 1, 10L, 20L), (1L, 2, 30L, 40L)))
  }

  test("single-symbol pattern: every occurrence is its own match") {
    val df = ev((1, 10, "click"), (1, 20, "view"), (1, 30, "click"))
    assert(matches(df, Seq("click"), 1) ==
      Seq((1L, 1, 10L, 10L), (1L, 2, 30L, 30L)))
  }

  test("keys are independent; keys without a match are absent") {
    val df = ev((1, 10, "view"), (2, 15, "click"), (1, 20, "click"),
      (2, 25, "view"), (1, 30, "purchase"))
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 30L)))
  }

  // ---- quantified stages (patternMatchesTimes) ----

  private def matchesTimes(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[(String, Int, Int)], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesTimes(df, col("k"), col("tms"), col("oid"), col("ty"),
        pattern, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  private val U = Cep.Unbounded

  test("timesOrMore: the greedy loop consumes every view; start = first loop event") {
    val pat = Seq(("view", 3, U), ("purchase", 1, 1))
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"),
      (1, 40, "view"), (1, 50, "purchase"))
    assert(matchesTimes(df, pat, 1000) == Seq((1L, 1, 10L, 50L)))
    // below the floor: two views do not satisfy min = 3
    val short = ev((2, 10, "view"), (2, 20, "view"), (2, 30, "purchase"))
    assert(matchesTimes(short, pat, 1000).isEmpty)
  }

  test("times(n) exact: the (max+1)-th loop event is ignored, not a kill") {
    // relaxed contiguity inside the loop too: a view beyond max behaves
    // like any non-matching event while the run waits for the purchase
    val pat = Seq(("view", 2, 2), ("purchase", 1, 1))
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"),
      (1, 40, "purchase"))
    assert(matchesTimes(df, pat, 1000) == Seq((1L, 1, 10L, 40L)))
  }

  test("adjacent same-type stages: greedy extends the loop before advancing") {
    // (view,1,2)(view,1,1): greedy fills the loop to max, so three views
    // complete as loop(10,20) + final(30) — not loop(10) + final(20)
    val pat = Seq(("view", 1, 2), ("view", 1, 1))
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"))
    assert(matchesTimes(df, pat, 1000) == Seq((1L, 1, 10L, 30L)))
  }

  test("loop noise is relaxed: non-pattern events never end a loop") {
    val pat = Seq(("view", 2, U), ("purchase", 1, 1))
    val df = ev((1, 10, "view"), (1, 20, "error"), (1, 30, "view"),
      (1, 40, "signup"), (1, 50, "purchase"))
    assert(matchesTimes(df, pat, 1000) == Seq((1L, 1, 10L, 50L)))
  }

  test("quantified timeout: span >= window abandons; the abandoning view reopens at count 1") {
    val pat = Seq(("view", 3, U), ("purchase", 1, 1))
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 200, "view"),
      (1, 210, "view"), (1, 220, "view"), (1, 250, "purchase"))
    // 200 - 10 >= 100 abandons the first loop; the view at 200 restarts
    assert(matchesTimes(df, pat, 100) == Seq((1L, 1, 200L, 250L)))
  }

  test("final stage with an exact multi-count: emits on its min-th event") {
    val pat = Seq(("view", 1, 1), ("click", 2, 2))
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "click"),
      (1, 40, "click"))
    assert(matchesTimes(df, pat, 1000) == Seq((1L, 1, 10L, 30L)))
  }

  test("single quantified stage: disjoint exact-count groups, skip past last row") {
    val pat = Seq(("view", 3, 3))
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"),
      (1, 40, "view"), (1, 50, "view"), (1, 60, "view"), (1, 70, "view"))
    assert(matchesTimes(df, pat, 1000) ==
      Seq((1L, 1, 10L, 30L), (1L, 2, 40L, 60L)))
  }

  test("(t,1,1) quantifiers reproduce patternMatches exactly") {
    val df = ev((1, 10, "view"), (1, 20, "error"), (1, 30, "click"),
      (1, 40, "purchase"), (1, 50, "view"), (1, 60, "click"),
      (1, 70, "purchase"), (2, 15, "view"), (2, 25, "click"))
    val q = matchesTimes(df, vcp.map(t => (t, 1, 1)), 1000)
    assert(q == matches(df, vcp, 1000))
  }

  test("optional middle stage: matched when present, skipped when absent") {
    val pat = Seq(("view", 1, 1), ("click", 0, U), ("purchase", 1, 1))
    // with clicks: consumed; without: purchase completes straight away
    val withC = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "click"),
      (1, 40, "purchase"))
    assert(matchesTimes(withC, pat, 1000) == Seq((1L, 1, 10L, 40L)))
    val withoutC = ev((2, 10, "view"), (2, 20, "purchase"))
    assert(matchesTimes(withoutC, pat, 1000) == Seq((2L, 1, 10L, 20L)))
    // the plain (1,1,1) pattern does NOT match the clickless run
    assert(matches(withoutC, vcp, 1000).isEmpty)
  }

  test("two consecutive optional stages can both be skipped or partially taken") {
    val pat = Seq(("view", 1, 1), ("click", 0, 1), ("signup", 0, 1),
      ("purchase", 1, 1))
    val skipBoth = ev((1, 10, "view"), (1, 20, "purchase"))
    assert(matchesTimes(skipBoth, pat, 1000) == Seq((1L, 1, 10L, 20L)))
    val takeSecond = ev((2, 10, "view"), (2, 20, "signup"), (2, 30, "purchase"))
    assert(matchesTimes(takeSecond, pat, 1000) == Seq((2L, 1, 10L, 30L)))
    val takeBoth = ev((3, 10, "view"), (3, 20, "click"), (3, 30, "signup"),
      (3, 40, "purchase"))
    assert(matchesTimes(takeBoth, pat, 1000) == Seq((3L, 1, 10L, 40L)))
    // order still enforced: a click AFTER the signup cannot re-enter the
    // earlier optional stage; the purchase still completes (relaxed)
    val outOfOrder = ev((4, 10, "view"), (4, 20, "signup"), (4, 30, "click"),
      (4, 40, "purchase"))
    assert(matchesTimes(outOfOrder, pat, 1000) == Seq((4L, 1, 10L, 40L)))
  }

  test("optional loop with a floor elsewhere: greedy prefers matching over skipping") {
    // (view 1)(click 0..1)(click... no — distinct: (view)(click opt)(click 1,1)
    // an event matching BOTH the optional stage and the stage after it
    // fills the optional one first (ascending targets)
    val pat = Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1))
    val two = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "click"))
    assert(matchesTimes(two, pat, 1000) == Seq((1L, 1, 10L, 30L)))
    // only one click: it fills the OPTIONAL slot (greedy), so the final
    // required click never arrives — no match
    val one = ev((2, 10, "view"), (2, 20, "click"))
    assert(matchesTimes(one, pat, 1000).isEmpty)
  }

  private def matchesTimesNfa(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[(String, Int, Int)], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesTimesNfa(df, col("k"), col("tms"), col("oid"),
        col("ty"), pattern, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("patternMatchesTimesNfa: the branching opt-in finds Flink's skip-branch matches") {
    val pat = Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1))
    // the pinned greedy NO-MATCH (the overlapWarnings fixture): one click
    // fills the optional slot greedily; the NFA's skip branch completes
    val one = ev((2, 10, "view"), (2, 20, "click"))
    assert(matchesTimes(one, pat, 1000).isEmpty)
    assert(matchesTimesNfa(one, pat, 1000) == Seq((2L, 1, 10L, 20L)))
    // two clicks: greedy emits at the second (optional filled first); the
    // NFA family's EARLIEST completion is the first click's skip branch
    val two = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "click"))
    assert(matchesTimes(two, pat, 1000) == Seq((1L, 1, 10L, 30L)))
    assert(matchesTimesNfa(two, pat, 1000) == Seq((1L, 1, 10L, 20L)))
    // flexible loop into the same type (the other warned shape): greedy
    // extends forever and never matches; the NFA advance branch emits
    val loopPat = Seq(("view", 1, U), ("view", 1, 1))
    val vv = ev((3, 10, "view"), (3, 20, "view"))
    assert(matchesTimes(vv, loopPat, 1000).isEmpty)
    assert(matchesTimesNfa(vv, loopPat, 1000) == Seq((3L, 1, 10L, 20L)))
    // choice-free pattern: NFA ≡ greedy, timeouts included
    val vcp = Seq(("view", 1, 1), ("click", 1, 1), ("purchase", 1, 1))
    val free = ev((4, 10, "view"), (4, 20, "click"), (4, 30, "purchase"),
      (4, 40, "view"), (4, 2000, "click"), (4, 2010, "view"),
      (4, 2020, "click"), (4, 2030, "purchase"),
      (5, 10, "view"), (5, 20, "purchase"))
    assert(matchesTimesNfa(free, vcp, 1000) == matchesTimes(free, vcp, 1000))
    assert(matchesTimesNfa(free, vcp, 1000).nonEmpty)
    // per-run window: the family resets past the window and reopens
    val late = ev((6, 10, "view"), (6, 2000, "click"),
      (6, 2010, "view"), (6, 2020, "click"))
    assert(matchesTimesNfa(late, pat, 1000) == Seq((6L, 1, 2010L, 2020L)))
    // exotic keys are rejected loudly (no branching SQL fold)
    intercept[IllegalArgumentException] {
      Cep.patternMatchesTimesNfa(one.withColumn("k", col("k").cast("double")),
        col("k"), col("tms"), col("oid"), col("ty"), pat, 1000)
    }
  }

  test("quantifier validation: unbounded last stage and zero min are rejected") {
    val df = ev((1, 10, "view"))
    intercept[IllegalArgumentException] {
      Cep.patternMatchesTimes(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq(("view", 1, U)), 1000)
    }
    intercept[IllegalArgumentException] {
      Cep.patternMatchesTimes(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq(("view", 0, 1), ("click", 1, 1)), 1000)
    }
  }

  // ---- predicate stages (patternMatchesWhere) ----

  private def evV(rows: (Long, Long, String, Double)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.zipWithIndex
      .map { case ((k, t, ty, v), i) => (k, t, i.toLong, ty, v) }
      .toDF("k", "tms", "oid", "ty", "v")
  }

  private def matchesWhere(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(String, Int, Int)], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesWhere(df, col("k"), col("tms"), col("oid"),
        stages, w, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("where(): stage conditions read event fields, not just types") {
    // only the value>50 view opens; only the value>100 purchase completes
    val df = evV((1, 10, "view", 20.0), (1, 20, "view", 80.0),
      (1, 30, "purchase", 50.0), (1, 40, "purchase", 150.0))
    val stages = Seq(("e.ty = 'view' AND e.value > 50.0", 1, 1),
      ("e.ty = 'purchase' AND e.value > 100.0", 1, 1))
    assert(matchesWhere(df, stages, 1000) == Seq((1L, 1, 20L, 40L)))
  }

  test("where(): quantified predicate loop (two qualifying views then any purchase)") {
    val df = evV((1, 10, "view", 90.0), (1, 20, "view", 5.0),
      (1, 30, "view", 70.0), (1, 40, "purchase", 1.0))
    val stages = Seq(("e.ty = 'view' AND e.value > 50.0", 2, Cep.Unbounded),
      ("e.ty = 'purchase'", 1, 1))
    // the value-5 view is ignored (fails the loop predicate — relaxed)
    assert(matchesWhere(df, stages, 1000) == Seq((1L, 1, 10L, 40L)))
    // with min 3 qualifying views it does not complete
    val three = Seq(("e.ty = 'view' AND e.value > 50.0", 3, Cep.Unbounded),
      ("e.ty = 'purchase'", 1, 1))
    assert(matchesWhere(df, three, 1000).isEmpty)
  }

  test("where(): type-equality predicates reproduce patternMatches exactly") {
    val df = evV((1, 10, "view", 1.0), (1, 20, "error", 1.0),
      (1, 30, "click", 1.0), (1, 40, "purchase", 1.0),
      (2, 15, "view", 1.0), (2, 25, "click", 1.0))
    val stages = vcp.map(t => (s"e.ty = '$t'", 1, 1))
    val typed = matches(df.drop("v"), vcp, 1000)
    assert(matchesWhere(df, stages, 1000) == typed)
  }

  test("where(): timeout + reopen respect the stage-0 predicate") {
    val df = evV((1, 10, "view", 90.0), (1, 2000, "view", 10.0),
      (1, 2010, "view", 95.0), (1, 2020, "purchase", 1.0))
    val stages = Seq(("e.ty = 'view' AND e.value > 50.0", 1, 1),
      ("e.ty = 'purchase'", 1, 1))
    // the low-value view at 2000 abandons the stale partial but cannot
    // re-open (fails pred0); the 95-value view at 2010 does
    assert(matchesWhere(df, stages, 100) == Seq((1L, 1, 2010L, 2020L)))
  }

  private def matchesIter(df: org.apache.spark.sql.DataFrame,
      stages: Seq[(String, Int, Int)], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesIter(df, col("k"), col("tms"), col("oid"),
        stages, w, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("iterative condition: a stage reads the match-opening event") {
    val stages = Seq(("e.ty = 'view'", 1, 1),
      ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1))
    // view value 30: the 50-purchase fails (needs > 60), the 70 completes
    val df = evV((1, 10, "view", 30.0), (1, 20, "purchase", 50.0),
      (1, 30, "purchase", 70.0),
      // a cheaper opener later: its own threshold is lower
      (1, 40, "view", 10.0), (1, 50, "purchase", 25.0))
    assert(matchesIter(df, stages, 1000) ==
      Seq((1L, 1, 10L, 30L), (1L, 2, 40L, 50L)))
  }

  test("iterative condition: capture is the FIRST loop event; timeout re-captures") {
    val stages = Seq(("e.ty = 'view'", 1, U),
      ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1))
    // the loop captures the FIRST view (value 40 -> threshold 80), not
    // the later cheaper one
    val df = evV((1, 10, "view", 40.0), (1, 20, "view", 5.0),
      (1, 30, "purchase", 50.0), (1, 40, "purchase", 90.0))
    assert(matchesIter(df, stages, 1000) == Seq((1L, 1, 10L, 40L)))
    // after a timeout the abandoning view RE-captures (threshold 10)
    val to = evV((2, 10, "view", 40.0), (2, 2000, "view", 5.0),
      (2, 2010, "purchase", 12.0))
    assert(matchesIter(to, stages, 100) == Seq((2L, 1, 2000L, 2010L)))
  }

  test("iterative + optional compose: the captured value guards the optional slot") {
    // (view)(click > first.value, OPTIONAL)(any click): a low click fails
    // the guarded optional stage and lands directly on the final stage
    // (skip), a high click fills the optional slot first (greedy,
    // ascending targets) and the NEXT click completes — observably
    // different match ends
    val stages = Seq(("e.ty = 'view'", 1, 1),
      ("e.ty = 'click' AND e.value > first.value", 0, 1),
      ("e.ty = 'click'", 1, 1))
    val low = evV((1, 10, "view", 50.0), (1, 20, "click", 10.0),
      (1, 30, "click", 10.0))
    assert(matchesIter(low, stages, 1000) == Seq((1L, 1, 10L, 20L)))
    val high = evV((2, 10, "view", 50.0), (2, 20, "click", 90.0),
      (2, 30, "click", 10.0))
    assert(matchesIter(high, stages, 1000) == Seq((2L, 1, 10L, 30L)))
  }

  test("iterative condition: stage 0 referencing first.* is rejected") {
    val df = evV((1, 10, "view", 1.0))
    intercept[IllegalArgumentException] {
      Cep.patternMatchesIter(df, col("k"), col("tms"), col("oid"),
        Seq(("e.value > first.value", 1, 1), ("e.ty = 'purchase'", 1, 1)),
        1000, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
    }
  }

  test("where(): reserved payload names rejected") {
    val df = evV((1, 10, "view", 1.0))
    intercept[IllegalArgumentException] {
      Cep.patternMatchesWhere(df, col("k"), col("tms"), col("oid"),
        Seq(("e.ty = 'view'", 1, 1)), 1000,
        payload = Seq("tms" -> col("v")))
    }
  }

  // ---- AFTER MATCH SKIP TO NEXT ROW (patternMatchesSkipNext) ----

  private def matchesSkip(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[String], w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesSkipNext(df, col("k"), col("tms"), col("oid"),
        col("ty"), pattern, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("skip to next row: every start emits; matches overlap") {
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "click"),
      (1, 40, "purchase"))
    assert(matchesSkip(df, vcp, 1000) ==
      Seq((1L, 1, 10L, 40L), (1L, 2, 20L, 40L)))
    // skip past last row on the same input: one match only
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 40L)))
  }

  test("skip to next row: each run times its own window from its own start") {
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "click"),
      (1, 40, "purchase"))
    // window 25: the run from 10 dies (purchase at 40 is >= 10+25);
    // the run from 20 completes (30 and 40 are inside 20+25)
    assert(matchesSkip(df, vcp, 25) == Seq((1L, 1, 20L, 40L)))
  }

  test("skip to next row: earliest completion per start") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "click"),
      (1, 40, "purchase"), (1, 50, "purchase"))
    assert(matchesSkip(df, vcp, 1000) == Seq((1L, 1, 10L, 40L)))
  }

  test("skip to next row: single-symbol pattern marks every occurrence") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 30, "view"))
    assert(matchesSkip(df, Seq("view"), 1) ==
      Seq((1L, 1, 10L, 10L), (1L, 2, 30L, 30L)))
  }

  // ---- match-payload output (patternMatchesSelect) ----

  private def matchesSel(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[String], w: Long): Seq[(Long, Int, Int, Long, Long)] =
    Cep.patternMatchesSelect(df, col("k"), col("tms"), col("oid"),
        col("ty"), pattern, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  test("select: every matched stage's event (tms, oid) is returned") {
    // oids are assigned by input position: view=0, error=1, click=2,
    // purchase=3 — the noise error is NOT in the match payload
    val df = ev((1, 10, "view"), (1, 15, "error"), (1, 20, "click"),
      (1, 30, "purchase"))
    assert(matchesSel(df, vcp, 1000) == Seq(
      (1L, 1, 1, 10L, 0L), (1L, 1, 2, 20L, 2L), (1L, 1, 3, 30L, 3L)))
  }

  test("select: envelope equals patternMatches; payload rows agree per match") {
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "click"),
      (1, 40, "purchase"), (1, 50, "view"), (1, 60, "click"),
      (1, 70, "purchase"), (2, 15, "view"), (2, 25, "click"))
    val sel = matchesSel(df, vcp, 1000)
    // reconstruct (k, match_n, min, max) from the payload rows
    val env = sel.groupBy(t => (t._1, t._2)).map { case ((k, n), rows) =>
      (k, n, rows.map(_._4).min, rows.map(_._4).max)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(env == matches(df, vcp, 1000))
    // the SECOND view (greedy earliest start keeps the first) is absent
    assert(!sel.exists(t => t._4 == 20L))
  }

  test("select: timeout re-open captures the abandoning event as the new stage 1") {
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 2000, "view"),
      (1, 2010, "click"), (1, 2020, "purchase"))
    assert(matchesSel(df, vcp, 100) == Seq(
      (1L, 1, 1, 2000L, 2L), (1L, 1, 2, 2010L, 3L), (1L, 1, 3, 2020L, 4L)))
  }

  test("select: single-stage and repeated-symbol patterns") {
    val one = ev((1, 10, "click"), (1, 20, "view"), (1, 30, "click"))
    assert(matchesSel(one, Seq("click"), 1) == Seq(
      (1L, 1, 1, 10L, 0L), (1L, 2, 1, 30L, 2L)))
    val rep = ev((2, 10, "view"), (2, 20, "view"), (2, 30, "view"),
      (2, 40, "view"))
    assert(matchesSel(rep, Seq("view", "view"), 1000) == Seq(
      (2L, 1, 1, 10L, 0L), (2L, 1, 2, 20L, 1L),
      (2L, 2, 1, 30L, 2L), (2L, 2, 2, 40L, 3L)))
  }

  // ---- string-literal masking in first.* handling ----

  test("first. inside a string literal is neither rewritten nor rejected") {
    // stage-1 predicate compares ty against the LITERAL 'first.home' — it
    // must stay a literal (a blind regex would rewrite it to
    // 'acc.f0.home' and silently change match results)
    val stages = Seq(("e.ty = 'view'", 1, 1), ("e.ty = 'first.home'", 1, 1))
    val df = evV((1, 10, "view", 1.0), (1, 20, "first.home", 1.0))
    assert(matchesIter(df, stages, 1000) == Seq((1L, 1, 10L, 20L)))
    // stage 0 containing the token ONLY inside a literal is accepted
    val s0 = Seq(("e.ty = 'first.home'", 1, 1), ("e.ty = 'purchase'", 1, 1))
    val df2 = evV((2, 10, "first.home", 1.0), (2, 20, "purchase", 1.0))
    assert(matchesIter(df2, s0, 1000) == Seq((2L, 1, 10L, 20L)))
    // a REAL first. reference outside literals still rewrites (regression)
    val mixed = Seq(("e.ty = 'view'", 1, 1),
      ("e.ty = 'first.home' AND e.value > first.value", 1, 1))
    val df3 = evV((3, 10, "view", 5.0), (3, 20, "first.home", 3.0),
      (3, 30, "first.home", 9.0))
    assert(matchesIter(df3, mixed, 1000) == Seq((3L, 1, 10L, 30L)))
    // escaped quote inside a literal does not derail the masking
    assert(Cep.mapOutsideLiterals("a = 'it\\'s first.' AND first.x")(
      _.replaceAll("\\bfirst\\.", "F.")) == "a = 'it\\'s first.' AND F.x")
  }

  test("first. inside a DOUBLE-QUOTED literal is neither rewritten nor rejected") {
    // Spark's default lexer accepts "..." as a string literal — the
    // masking must treat it like '...' (the fold path's regex rewrite and
    // the typed path's real parser must agree)
    assert(Cep.mapOutsideLiterals("a = \"it first.\" AND first.x")(
      _.replaceAll("\\bfirst\\.", "F.")) == "a = \"it first.\" AND F.x")
    assert(Cep.mapOutsideLiterals("a = \"doubled \"\" first.\" AND first.x")(
      _.replaceAll("\\bfirst\\.", "F.")) ==
      "a = \"doubled \"\" first.\" AND F.x")
    assert(!Cep.existsOutsideLiterals("e.ty = \"first.home\"",
      "(?s).*\\bfirst\\..*"))
    // typed path (long keys): the parser keeps the literal
    val stages = Seq(("e.ty = 'view'", 1, 1), ("e.ty = \"first.home\"", 1, 1))
    val df = evV((1, 10, "view", 1.0), (1, 20, "first.home", 1.0))
    assert(matchesIter(df, stages, 1000) == Seq((1L, 1, 10L, 20L)))
    // fold path (double keys — no typed route): the masked rewrite keeps it
    val dfD = df.withColumn("k", col("k").cast("double"))
    val gotD = Cep.patternMatchesIter(dfD, col("k"), col("tms"), col("oid"),
        stages, 1000, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
      .collect().map(r => (r.getDouble(0).toLong, r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(gotD == Seq((1L, 1, 10L, 20L)))
    // a double-quoted stage-0 literal containing the token is accepted
    val s0 = Seq(("e.ty = \"first.home\"", 1, 1), ("e.ty = 'purchase'", 1, 1))
    val df2 = evV((2, 10, "first.home", 1.0), (2, 20, "purchase", 1.0))
    assert(matchesIter(df2, s0, 1000) == Seq((2L, 1, 10L, 20L)))
  }

  // ---- round 12: typed-plan key routing (string / null / fold parity) ----

  /** A dense multi-key fixture with tied timestamps, noise, timeouts and
    * re-opens — deliberately adversarial for automaton parity checks. */
  private def parityFixture = {
    val s = spark
    import s.implicits._
    (0 until 600).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val k = (h % 7).toLong
      val ty = Seq("view", "click", "purchase", "error", "signup")(
        ((h / 7) % 5).toInt)
      (k, ((h / 35) % 50).toLong, i.toLong, ty, (h % 100).toDouble)
    }.toDF("k", "tms", "oid", "ty", "v")
  }

  test("typed sorted plans equal the aggregate fold on every CEP form") {
    // double keys have no typed route, so the SQL `aggregate` fold serves
    // them — running the same events through long (typed) and double
    // (fold) keys IS the typed-vs-fold parity check, on every operator
    // that has both paths
    val dfL = parityFixture
    val dfD = dfL.withColumn("k", col("k").cast("double"))
    def tup(df: org.apache.spark.sql.DataFrame, longKey: Boolean) =
      df.collect().map(r => (
          if (longKey) r.getLong(0) else r.getDouble(0).toLong,
          r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    val w = 30L
    def both(f: (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
        : (Seq[(Long, Int, Long, Long)], Seq[(Long, Int, Long, Long)]) =
      (tup(f(dfL), longKey = true), tup(f(dfD), longKey = false))
    // relaxed
    locally {
      val (t, f) = both(d => Cep.patternMatches(d, col("k"), col("tms"),
        col("oid"), col("ty"), vcp, w))
      assert(t.nonEmpty && t == f)
    }
    // quantified (loop + optional)
    locally {
      val pat = Seq(("view", 1, U), ("click", 0, U), ("purchase", 1, 1))
      val (t, f) = both(d => Cep.patternMatchesTimes(d, col("k"), col("tms"),
        col("oid"), col("ty"), pat, w))
      assert(t.nonEmpty && t == f)
    }
    // strict + notNext (three stages so the window-lead fast path is NOT
    // taken and the fold/sorted pair is what runs)
    locally {
      val (t, f) = both(d => Cep.patternMatchesNext(d, col("k"), col("tms"),
        col("oid"), col("ty"), vcp, w, nextStages = Set(2),
        notNext = Map(1 -> Seq("error"))))
      assert(t == f)
    }
    // negation with a trailing ban (flush included)
    locally {
      val (t, f) = both(d => Cep.patternMatchesNeg(d, col("k"), col("tms"),
        col("oid"), col("ty"), Seq("view", "purchase"), w,
        notBetween = Map(1 -> Seq("error")), notAfter = Seq("click")))
      assert(t.nonEmpty && t == f)
    }
    // skip to next row (overlapping runs)
    locally {
      val (t, f) = both(d => Cep.patternMatchesSkipNext(d, col("k"),
        col("tms"), col("oid"), col("ty"), vcp, w))
      assert(t.nonEmpty && t == f)
    }
    // where() predicate stages
    locally {
      val stages = Seq(("e.ty = 'view' AND e.value > 20.0", 1, 1),
        ("e.ty = 'purchase'", 1, 1))
      val (t, f) = both(d => Cep.patternMatchesWhere(d, col("k"), col("tms"),
        col("oid"), stages, w,
        payload = Seq("ty" -> col("ty"), "value" -> col("v"))))
      assert(t.nonEmpty && t == f)
    }
    // iterative conditions (capture + analyzer-resolved predicates)
    locally {
      val stages = Seq(("e.ty = 'view'", 1, 1),
        ("e.ty = 'purchase' AND e.value > first.value", 1, 1))
      val (t, f) = both(d => Cep.patternMatchesIter(d, col("k"), col("tms"),
        col("oid"), stages, w,
        payload = Seq("ty" -> col("ty"), "value" -> col("v"))))
      assert(t.nonEmpty && t == f)
    }
    // iterative + QUANTIFIED loop (the capture is the first loop event;
    // the typed stepper's counter must mirror the fold's acc.c)
    locally {
      val stages = Seq(("e.ty = 'view'", 1, U),
        ("e.ty = 'click'", 0, U),
        ("e.ty = 'purchase' AND e.value >= first.value", 1, 1))
      val (t, f) = both(d => Cep.patternMatchesIter(d, col("k"), col("tms"),
        col("oid"), stages, w,
        payload = Seq("ty" -> col("ty"), "value" -> col("v"))))
      assert(t.nonEmpty && t == f)
    }
  }

  test("string keys route through the typed sorted plan; int keys cast back") {
    val dfL = parityFixture
    val dfS = dfL.withColumn("k", concat(lit("user_"), col("k")))
    val wantL = matches(dfL, vcp, 30L)
    val gotS = Cep.patternMatches(dfS, col("k"), col("tms"), col("oid"),
        col("ty"), vcp, 30L)
      .collect()
      .map(r => (r.getString(0).stripPrefix("user_").toLong, r.getInt(1),
        r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(gotS == wantL)
    // int keys widen to long for the plan and the OUTPUT casts back to int
    val dfI = dfL.withColumn("k", col("k").cast("int"))
    val resI = Cep.patternMatchesSkipNext(dfI, col("k"), col("tms"),
      col("oid"), col("ty"), vcp, 30L)
    assert(resI.schema("k").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val gotI = resI.collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val wantSkip = matchesSkip(dfL, vcp, 30L)
    assert(gotI == wantSkip)
    // select() accepts string keys (it has no fold twin)
    val selS = Cep.patternMatchesSelect(dfS, col("k"), col("tms"),
      col("oid"), col("ty"), vcp, 30L).collect()
    val selL = Cep.patternMatchesSelect(dfL, col("k"), col("tms"),
      col("oid"), col("ty"), vcp, 30L).collect()
    assert(selS.length == selL.length && selS.nonEmpty)
  }

  test("NULL keys group together on the typed plan (the fold's null-group semantics)") {
    // key 3 nulled out: the typed plan must GROUP null keys and emit
    // their matches with k NULL — exactly what the SQL fold's GROUP BY
    // does (the round-11 routing raised an encoder NPE here instead)
    val dfL = parityFixture
      .withColumn("k", when(col("k") === 3, lit(null)).otherwise(col("k")))
    val dfD = dfL.withColumn("k", col("k").cast("double"))
    def tupN(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (
          if (r.isNullAt(0)) Long.MinValue
          else r.get(0) match {
            case l: java.lang.Long => l.longValue
            case d: java.lang.Double => d.toLong
          },
          r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    val typed = tupN(Cep.patternMatches(dfL, col("k"), col("tms"),
      col("oid"), col("ty"), vcp, 30L))
    val fold = tupN(Cep.patternMatches(dfD, col("k"), col("tms"),
      col("oid"), col("ty"), vcp, 30L))
    assert(typed.exists(_._1 == Long.MinValue),
      "the null-key group must emit matches")
    assert(typed == fold)
    // string keys: a null string key groups too
    val dfS = parityFixture.withColumn("k",
      when(col("k") === 3, lit(null)).otherwise(concat(lit("u"), col("k"))))
    val gotS = Cep.patternMatches(dfS, col("k"), col("tms"), col("oid"),
        col("ty"), vcp, 30L)
      .collect()
      .map(r => (if (r.isNullAt(0)) Long.MinValue
        else r.getString(0).stripPrefix("u").toLong,
        r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(gotS == typed)
  }

  // ---- CONSECUTIVE loops (round 12) ----

  private def matchesConsec(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[(String, Int, Int)], w: Long,
      consec: Set[Int]): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesTimesConsecutive(df, col("k"), col("tms"),
        col("oid"), col("ty"), pattern, w, consec)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("consecutive loop: a break below the floor kills; the run restarts after it") {
    val pat = Seq(("view", 2, U), ("purchase", 1, 1))
    // the error splits the views: only the post-error pair is consecutive
    val df = ev((1, 10, "view"), (1, 15, "error"), (1, 20, "view"),
      (1, 25, "view"), (1, 30, "purchase"))
    assert(matchesConsec(df, pat, 1000, Set(0)) == Seq((1L, 1, 20L, 30L)))
    // the RELAXED operator (pre-filtered scan ignores the error) starts
    // at the first view — the strictness contrast
    assert(matchesTimes(
      df.filter(col("ty").isin("view", "purchase")), pat, 1000) ==
      Seq((1L, 1, 10L, 30L)))
    // a single view before the break never reaches the floor: no match
    val below = ev((2, 10, "view"), (2, 15, "error"), (2, 20, "purchase"))
    assert(matchesConsec(below, pat, 1000, Set(0)).isEmpty)
  }

  test("consecutive loop: a break at/above the floor CLOSES the loop; the partial survives") {
    val pat = Seq(("view", 2, U), ("purchase", 1, 1))
    // two views, then an error (loop closes), a LATER view cannot extend
    // the closed loop, and the purchase still completes from the
    // original start
    val df = ev((1, 10, "view"), (1, 15, "view"), (1, 20, "error"),
      (1, 25, "view"), (1, 30, "purchase"))
    assert(matchesConsec(df, pat, 1000, Set(0)) == Seq((1L, 1, 10L, 30L)))
    // floor contrast: with the break before the SECOND view, the first
    // run dies and the unbroken pair after the error carries the match
    val df2 = ev((2, 10, "view"), (2, 12, "error"), (2, 20, "view"),
      (2, 30, "view"), (2, 40, "purchase"))
    assert(matchesConsec(df2, pat, 1000, Set(0)) == Seq((2L, 1, 20L, 40L)))
    // timeout still abandons a closed-loop partial
    val t = ev((3, 10, "view"), (3, 15, "view"), (3, 20, "error"),
      (3, 2000, "purchase"))
    assert(matchesConsec(t, pat, 100, Set(0)).isEmpty)
    // validation: empty consecutive set and out-of-range stage rejected
    intercept[IllegalArgumentException] {
      matchesConsec(df, pat, 1000, Set.empty)
    }
    intercept[IllegalArgumentException] {
      matchesConsec(df, pat, 1000, Set(2))
    }
  }

  // ---- AFTER MATCH SKIP TO FIRST/LAST (round 12) ----

  private def matchesSkipTo(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[String], w: Long, k: Int): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesSkipTo(df, col("k"), col("tms"), col("oid"),
        col("ty"), pattern, w, k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("skip to first/last: the scan resumes at the matched middle stage") {
    // after (v10..p30) the scan rewinds to the matched click — v25
    // (buffered while the partial was beyond stage 1) opens the second,
    // OVERLAPPING funnel that skip-past-last-row misses entirely
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 25, "view"),
      (1, 30, "purchase"), (1, 35, "click"), (1, 40, "purchase"))
    assert(matchesSkipTo(df, vcp, 1000, 1) ==
      Seq((1L, 1, 10L, 30L), (1L, 2, 25L, 40L)))
    assert(matches(df, vcp, 1000) == Seq((1L, 1, 10L, 30L))) // past-last
    // a stage-0 event BEFORE the matched click is NOT replayed (Flink's
    // SKIP_TO_FIRST prunes runs that started before the skip point)
    val pre = ev((2, 10, "view"), (2, 15, "view"), (2, 20, "click"),
      (2, 30, "purchase"))
    assert(matchesSkipTo(pre, vcp, 1000, 1) == Seq((2L, 1, 10L, 30L)))
  }

  test("skip to first/last: same-type stages chain overlapping matches") {
    // (view, view) with skipTo = 1: each match's closing view opens the
    // next — the classic a-b, b-c, c-d chain
    val df = ev((1, 10, "view"), (1, 20, "view"), (1, 30, "view"),
      (1, 40, "view"))
    assert(matchesSkipTo(df, Seq("view", "view"), 1000, 1) ==
      Seq((1L, 1, 10L, 20L), (1L, 2, 20L, 30L), (1L, 3, 30L, 40L)))
    // past-last pairs disjointly
    assert(matches(df, Seq("view", "view"), 1000) ==
      Seq((1L, 1, 10L, 20L), (1L, 2, 30L, 40L)))
  }

  test("skip to first/last: timeout clears the buffer; skipTo bounds enforced") {
    // the partial (and its buffer) dies at the window; no match
    val df = ev((1, 10, "view"), (1, 20, "click"), (1, 2000, "purchase"))
    assert(matchesSkipTo(df, vcp, 100, 1).isEmpty)
    // the replayed segment respects windows: the second funnel times its
    // own window from ITS view
    val t = ev((2, 10, "view"), (2, 20, "click"), (2, 25, "view"),
      (2, 30, "purchase"), (2, 1500, "click"), (2, 1510, "purchase"))
    assert(matchesSkipTo(t, vcp, 100, 1) == Seq((2L, 1, 10L, 30L)))
    intercept[IllegalArgumentException] {
      matchesSkipTo(ev((1, 10, "view")), vcp, 1000, 0)
    }
    intercept[IllegalArgumentException] {
      matchesSkipTo(ev((1, 10, "view")), vcp, 1000, 3)
    }
    intercept[IllegalArgumentException] {
      matchesSkipTo(ev((1, 10, "view")), Seq("view"), 1000, 1)
    }
  }

  test("overlapWarnings: flexible loop or optional stage sharing the next stage's type") {
    // the pinned greedy no-match class: (view)(click optional)(click)
    assert(Cep.overlapWarnings(
      Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1))).size == 1)
    // flexible loop into the same type
    assert(Cep.overlapWarnings(
      Seq(("view", 1, U), ("view", 1, 1))).size == 1)
    // exact-count loop has no choice — greedy and NFA agree; no warning
    assert(Cep.overlapWarnings(
      Seq(("view", 2, 2), ("view", 1, 1))).isEmpty)
    // distinct adjacent types: no warning
    assert(Cep.overlapWarnings(
      Seq(("view", 0, U), ("click", 1, 1))).isEmpty)
  }

  test("patternMatchesGroup: exact-count group times IS the unrolled stage list") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // key 1: view click view click -> one (10, 40) match
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"),
      (1L, 30L, 3L, "view"), (1L, 40L, 4L, "click"),
      // key 2: one full group only -> no match (needs two repetitions)
      (2L, 10L, 1L, "view"), (2L, 20L, 2L, "click"),
      // key 3: second repetition outside the window -> no match
      (3L, 10L, 1L, "view"), (3L, 20L, 2L, "click"),
      (3L, 2000L, 3L, "view"), (3L, 2010L, 4L, "click")
    ).toDF("k", "tms", "oid", "ty")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    val grouped = run(Cep.patternMatchesGroup(df, col("k"), col("tms"),
      col("oid"), col("ty"), group = Seq("view", "click"), times = 2,
      withinMs = 1000))
    assert(grouped == Seq((1L, 10L, 40L)))
    // delegation parity: identical to patternMatches on the unrolled list
    assert(grouped == run(Cep.patternMatches(df, col("k"), col("tms"),
      col("oid"), col("ty"), Seq("view", "click", "view", "click"), 1000)))
    // guards: empty group, zero times, 1x1 degenerate
    intercept[IllegalArgumentException] {
      Cep.patternMatchesGroup(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq.empty, 2, 1000)
    }
    intercept[IllegalArgumentException] {
      Cep.patternMatchesGroup(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq("view"), 0, 1000)
    }
    intercept[IllegalArgumentException] {
      Cep.patternMatchesGroup(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq("view"), 1, 1000)
    }
  }

  test("keyRouteWarning: exotic key types fall back LOUDLY to the quadratic fold") {
    val s = spark
    import org.apache.spark.sql.types._
    // the warning names the type and the remedy (cast to a routed key)
    for (dt <- Seq(DoubleType, DecimalType(10, 2))) {
      val w = Cep.keyRouteWarning(dt)
      assert(w.contains(dt.catalogString) && w.contains("QUADRATIC") &&
        w.contains("BIGINT/STRING"))
    }
    // routing table: integral + string route; double/decimal do not (the
    // typedCep None case logs keyRouteWarning — same code path)
    def proj(c: org.apache.spark.sql.Column) = {
      import s.implicits._
      Seq((1L, 10L, 1L, "view")).toDF("k", "tms", "oid", "ty")
        .withColumn("k", c)
    }
    assert(Cep.typedCep(proj(col("k"))).isDefined)
    assert(Cep.typedCep(proj(col("k").cast("int"))).isDefined)
    assert(Cep.typedCep(proj(col("k").cast("string"))).isDefined)
    assert(Cep.typedCep(proj(col("k").cast("double"))).isEmpty)
    assert(Cep.typedCep(proj(col("k").cast("decimal(10,2)"))).isEmpty)
    // and the fallback still computes (parity with the routed plan is
    // pinned by "double keys have no typed route..." above)
    val got = Cep.patternMatches(
      proj(col("k").cast("double"))
        .unionByName(proj(col("k").cast("double"))
          .withColumn("tms", lit(20L)).withColumn("oid", lit(2L))
          .withColumn("ty", lit("purchase"))),
      col("k"), col("tms"), col("oid"), col("ty"),
      Seq("view", "purchase"), 1000).collect()
    assert(got.length == 1)
  }

  private def matchesUntil(df: org.apache.spark.sql.DataFrame,
      pattern: Seq[(String, Int, Int)], untilType: String,
      w: Long): Seq[(Long, Int, Long, Long)] =
    Cep.patternMatchesUntil(df, col("k"), col("tms"), col("oid"),
        col("ty"), pattern, untilType, w)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("until(): the stop event closes the unbounded loop and is NOT in the match") {
    // 3 clicks then a purchase: one match, end = the LAST click (30),
    // not the purchase (40)
    val df = ev((1L, 10L, "click"), (1L, 20L, "click"), (1L, 30L, "click"),
      (1L, 40L, "purchase"))
    assert(matchesUntil(df, Seq(("click", 2, Cep.Unbounded)), "purchase",
      1000) == Seq((1L, 1, 10L, 30L)))
    // relaxed contiguity: an interleaved non-pattern event changes nothing
    // (the scan pre-filters it away)
    val df2 = ev((2L, 10L, "click"), (2L, 15L, "error"), (2L, 20L, "click"),
      (2L, 40L, "purchase"))
    assert(matchesUntil(df2, Seq(("click", 2, Cep.Unbounded)), "purchase",
      1000) == Seq((2L, 1, 10L, 20L)))
  }

  test("until(): below-floor partials die; no stop event means no match") {
    // one click then purchase: below the floor of 2 — the partial dies
    val df = ev((1L, 10L, "click"), (1L, 20L, "purchase"),
      // a fresh run after: two clicks, closed in-window
      (1L, 30L, "click"), (1L, 40L, "click"), (1L, 50L, "purchase"))
    assert(matchesUntil(df, Seq(("click", 2, Cep.Unbounded)), "purchase",
      1000) == Seq((1L, 1, 30L, 40L)))
    // loop never closed (no purchase): end-of-input discards
    val df2 = ev((2L, 10L, "click"), (2L, 20L, "click"), (2L, 30L, "click"))
    assert(matchesUntil(df2, Seq(("click", 2, Cep.Unbounded)), "purchase",
      1000).isEmpty)
  }

  test("until(): window expiry discards; leading stages and the loop compose") {
    // the purchase lands past the window of the first click: no match,
    // and the late clicks open a new run that closes in-window
    val df = ev((1L, 10L, "click"), (1L, 20L, "click"),
      (1L, 2000L, "purchase"), // timed out vs t0=10
      (1L, 2010L, "click"), (1L, 2020L, "click"), (1L, 2030L, "purchase"))
    assert(matchesUntil(df, Seq(("click", 2, Cep.Unbounded)), "purchase",
      1000) == Seq((1L, 1, 2010L, 2020L)))
    // a leading exact stage before the unbounded loop: view then >= 2
    // clicks until purchase; start = the view
    val df2 = ev((3L, 10L, "view"), (3L, 20L, "click"), (3L, 30L, "click"),
      (3L, 40L, "click"), (3L, 50L, "purchase"))
    assert(matchesUntil(df2,
      Seq(("view", 1, 1), ("click", 2, Cep.Unbounded)), "purchase",
      1000) == Seq((3L, 1, 10L, 40L)))
  }

  test("until(): validation — bounded final stage, clashing until type rejected") {
    val df = ev((1L, 10L, "click"))
    intercept[IllegalArgumentException] {
      Cep.patternMatchesUntil(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq(("click", 2, 5)), "purchase", 1000)
    }
    intercept[IllegalArgumentException] {
      Cep.patternMatchesUntil(df, col("k"), col("tms"), col("oid"),
        col("ty"), Seq(("click", 2, Cep.Unbounded)), "click", 1000)
    }
  }
}

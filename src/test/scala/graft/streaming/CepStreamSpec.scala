package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.model.Envelopes
import graft.streaming.CepStream.CepEvent

/** Streaming CEP parity: the flatMapGroupsWithState automaton equals the
  * batch fold on a complete replay, wherever the micro-batch boundaries
  * fall — including a partial match that spans batches — and in-batch
  * disorder is repaired by the group sort. */
class CepStreamSpec extends SparkSpec {

  private val vcp = Seq("view", "click", "purchase")

  private def run(batches: Seq[Seq[CepEvent]], pattern: Seq[String] = vcp,
      w: Long = 604800000L): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attach(mem.toDS(), pattern, w).writeStream
      .format("memory").queryName("cep_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("cep_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private def batch(events: Seq[CepEvent], pattern: Seq[String] = vcp,
      w: Long = 604800000L): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.ops.Cep.patternMatches(events.toDF(), col("k"), col("tms"),
        col("oid"), col("ty"), pattern, w)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
  }

  test("a partial match spanning micro-batches completes from stored state") {
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    val b2 = Seq(CepEvent(1, 30, 3, "purchase"), CepEvent(1, 40, 4, "view"))
    val b3 = Seq(CepEvent(1, 50, 5, "click"), CepEvent(1, 60, 6, "purchase"))
    val all = b1 ++ b2 ++ b3
    val got = run(Seq(b1, b2, b3), w = 1000)
    assert(got == Seq((1L, 10L, 30L), (1L, 40L, 60L)))
    assert(got == batch(all, w = 1000))
  }

  test("timeout state carried across batches: stale partial abandoned") {
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    val b2 = Seq(CepEvent(1, 5000, 3, "purchase"))
    assert(run(Seq(b1, b2), w = 100).isEmpty)
    assert(batch(b1 ++ b2, w = 100).isEmpty)
  }

  test("in-batch disorder is repaired by the group sort") {
    val shuffled = Seq(CepEvent(1, 30, 3, "purchase"),
      CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    assert(run(Seq(shuffled), w = 1000) == Seq((1L, 10L, 30L)))
  }

  // ---- negation automaton (attachNeg / patternMatchesNeg) ----

  private val negPat = Seq("view", "purchase")
  private val negBetween = Map(1 -> Seq("error"))
  private val negAfter = Seq("click")

  private def runNeg(batches: Seq[Seq[CepEvent]], w: Long,
      close: Option[CepEvent] = None): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attachNeg(mem.toDS(), negPat, w, negBetween, negAfter)
      .writeStream.format("memory").queryName("cep_neg_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // an optional far-future heartbeat on an unused key advances the
      // watermark so pending watches time out (the stream's end-of-input)
      close.foreach { e =>
        mem.addData(e); q.processAllAvailable(); q.processAllAvailable()
      }
      s.table("cep_neg_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private def batchNeg(events: Seq[CepEvent],
      w: Long): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.ops.Cep.patternMatchesNeg(events.toDF(), col("k"), col("tms"),
        col("oid"), col("ty"), negPat, w, negBetween, negAfter)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
  }

  test("negation: banned click mid-window kills the pending match") {
    // view@10 purchase@20 opens a watch to 10+w; click@50 kills it; the
    // second run (view@200 purchase@210) survives to window end
    val evs = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "purchase"),
      CepEvent(1, 50, 3, "click"), CepEvent(1, 200, 4, "view"),
      CepEvent(1, 210, 5, "purchase"))
    assert(batchNeg(evs, w = 100) == Seq((1L, 200L, 210L)))
    val got = runNeg(Seq(evs), w = 100,
      close = Some(CepEvent(99, 100000, 9, "view")))
    assert(got == Seq((1L, 200L, 210L)))
  }

  test("negation: banned event arriving in a LATER micro-batch still kills") {
    // the watch opens in batch 1; the click lands mid-window in batch 2 —
    // stored state must carry the watch across the boundary and kill it
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "purchase"))
    val b2 = Seq(CepEvent(1, 60, 3, "click"))
    assert(batchNeg(b1 ++ b2, w = 100).isEmpty)
    assert(runNeg(Seq(b1, b2), w = 100,
      close = Some(CepEvent(99, 100000, 9, "view"))).isEmpty)
  }

  test("negation: error between view and purchase kills the partial") {
    val evs = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 15, 2, "error"),
      CepEvent(1, 20, 3, "purchase"),
      // clean run on another key for contrast
      CepEvent(2, 10, 4, "view"), CepEvent(2, 20, 5, "purchase"))
    assert(batchNeg(evs, w = 100) == Seq((2L, 10L, 20L)))
    assert(runNeg(Seq(evs), w = 100,
      close = Some(CepEvent(99, 100000, 9, "view"))) == Seq((2L, 10L, 20L)))
  }

  test("negation: watermark passing the window end emits the pending match") {
    // no event of key 1 ever arrives after the purchase: only the
    // watermark (driven by key 99's far-future event) closes the window
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "purchase"))
    val got = runNeg(Seq(b1), w = 100,
      close = Some(CepEvent(99, 100000, 9, "view")))
    assert(got == Seq((1L, 10L, 20L)))
    assert(batchNeg(b1, w = 100) == Seq((1L, 10L, 20L)))
  }

  test("negation: boundary — a click exactly at window end does NOT kill") {
    // window is [t0, t0+w): the click at t0+w is outside; the expiry
    // emits first and the match survives (Flink >= timeout convention)
    val evs = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "purchase"),
      CepEvent(1, 110, 3, "click"))
    assert(batchNeg(evs, w = 100) == Seq((1L, 10L, 20L)))
    assert(runNeg(Seq(evs), w = 100) == Seq((1L, 10L, 20L)))
  }

  test("negation fixture replay: batch splits equal the batch operator") {
    val s = spark
    import s.implicits._
    val types = (negPat ++ negBetween.values.flatten ++ negAfter).distinct
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin(types: _*))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val w = 259200000L
    val expected = batchNeg(events, w)
    assert(expected.nonEmpty)
    val far = CepEvent(-1, events.last.tms + 10 * w, 0, "view")
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runNeg(events.grouped(size).toSeq, w, close = Some(far))
        == expected)
    }
  }

  // ---- strict contiguity (attachNext / patternMatchesNext) ----

  private def runNext(batches: Seq[Seq[CepEvent]], pattern: Seq[String],
      w: Long, next: Set[Int]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attachNext(mem.toDS(), pattern, w, next).writeStream
      .format("memory").queryName("cep_next_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("cep_next_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private def batchNext(events: Seq[CepEvent], pattern: Seq[String],
      w: Long, next: Set[Int]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.ops.Cep.patternMatchesNext(events.toDF(), col("k"), col("tms"),
        col("oid"), col("ty"), pattern, w, next)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
  }

  test("strict contiguity: an intervening event in the NEXT micro-batch kills") {
    val vc = Seq("view", "click")
    // the partial opens in batch 1; batch 2 leads with an error — strict
    // adjacency must break across the boundary; the later adjacent pair
    // matches
    val b1 = Seq(CepEvent(1, 10, 1, "view"))
    val b2 = Seq(CepEvent(1, 20, 2, "error"), CepEvent(1, 30, 3, "view"),
      CepEvent(1, 40, 4, "click"))
    val all = b1 ++ b2
    assert(batchNext(all, vc, 1000, Set(1)) == Seq((1L, 30L, 40L)))
    assert(runNext(Seq(b1, b2), vc, 1000, Set(1)) == Seq((1L, 30L, 40L)))
    // contrast: adjacency held across the boundary completes
    val c2 = Seq(CepEvent(2, 20, 5, "click"))
    assert(runNext(Seq(Seq(CepEvent(2, 10, 6, "view")), c2), vc, 1000, Set(1))
      == Seq((2L, 10L, 20L)))
  }

  test("notNext: the very-next-slot ban holds across a micro-batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val vp = Seq("view", "purchase")
    val ban = Map(1 -> Seq("error"))
    def runIt(batches: Seq[Seq[CepEvent]]): Seq[(Long, Long, Long)] = {
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachNext(mem.toDS(), vp, 1000, Set.empty, ban)
        .writeStream.format("memory").queryName("cep_nn_out")
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table("cep_nn_out").collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end"))).sortBy(identity).toSeq
      } finally q.stop()
    }
    // the view closes batch 1 with its notNext slot OPEN; batch 2's first
    // event is the banned error — stored fr must carry the slot across
    val b1 = Seq(CepEvent(1, 10, 1, "view"))
    val b2 = Seq(CepEvent(1, 20, 2, "error"), CepEvent(1, 30, 3, "purchase"))
    assert(runIt(Seq(b1, b2)).isEmpty)
    // contrast: a discharging signup leads batch 2 -> the run completes
    val c2 = Seq(CepEvent(2, 20, 4, "signup"), CepEvent(2, 30, 5, "purchase"))
    assert(runIt(Seq(Seq(CepEvent(2, 10, 6, "view")), c2))
      == Seq((2L, 10L, 30L)))
    // batch parity on the same fixtures
    val batchSide = graft.ops.Cep.patternMatchesNext(
      (b1 ++ b2).toDF(), col("k"), col("tms"), col("oid"), col("ty"),
      vp, 1000, Set.empty, ban)
    assert(batchSide.collect().isEmpty)
  }

  test("strict fixture replay: batch splits equal the batch operator") {
    val s = spark
    import s.implicits._
    val events = Envelopes.events(s, sfDir())
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val vc = Seq("view", "click")
    val expected = batchNext(events, vc, 86400000L, Set(1))
    assert(expected.nonEmpty)
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runNext(events.grouped(size).toSeq, vc, 86400000L, Set(1))
        == expected)
    }
  }

  // ---- quantified automaton (attachTimes / patternMatchesTimes) ----

  private def runTimes(batches: Seq[Seq[CepEvent]],
      pattern: Seq[(String, Int, Int)], w: Long): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attachTimes(mem.toDS(), pattern, w).writeStream
      .format("memory").queryName("cep_times_out").outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("cep_times_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private def batchTimes(events: Seq[CepEvent],
      pattern: Seq[(String, Int, Int)], w: Long): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    graft.ops.Cep.patternMatchesTimes(events.toDF(), col("k"), col("tms"),
        col("oid"), col("ty"), pattern, w)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
  }

  private val timesPat = Seq(("view", 3, Int.MaxValue), ("purchase", 1, 1))

  test("the loop counter carries across micro-batch boundaries") {
    // two views in batch 1, the third view + purchase in batch 2: the
    // stored (stage, count, start) must resume mid-loop
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "view"))
    val b2 = Seq(CepEvent(1, 30, 3, "view"), CepEvent(1, 40, 4, "purchase"))
    val got = runTimes(Seq(b1, b2), timesPat, 1000)
    assert(got == Seq((1L, 10L, 40L)))
    assert(got == batchTimes(b1 ++ b2, timesPat, 1000))
  }

  test("a loop below its floor at the boundary does not emit; timeout resets the counter") {
    // count 2 < min 3 when the purchase lands in batch 2 → no match; the
    // next loop times out across batches (span >= w) and restarts clean
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "view"))
    val b2 = Seq(CepEvent(1, 30, 3, "purchase"), CepEvent(1, 40, 4, "view"))
    val b3 = Seq(CepEvent(1, 5000, 5, "view"), CepEvent(1, 5010, 6, "view"),
      CepEvent(1, 5020, 7, "view"), CepEvent(1, 5030, 8, "purchase"))
    val got = runTimes(Seq(b1, b2, b3), timesPat, 1000)
    assert(got == Seq((1L, 5000L, 5030L)))
    assert(got == batchTimes(b1 ++ b2 ++ b3, timesPat, 1000))
  }

  test("until(): the loop accumulates across batches; the stop event in a later batch closes it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val pat = Seq(("click", 2, Int.MaxValue))
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attachUntil(mem.toDS(), pat, "purchase", 1000)
      .writeStream.format("memory").queryName("cep_until_out")
      .outputMode("append").start()
    try {
      // clicks split across two batches, the closing purchase in a third
      mem.addData(CepEvent(1, 10, 1, "click"))
      q.processAllAvailable()
      mem.addData(CepEvent(1, 20, 2, "click"), CepEvent(1, 30, 3, "click"))
      q.processAllAvailable()
      assert(s.table("cep_until_out").isEmpty) // loop still open
      mem.addData(CepEvent(1, 40, 4, "purchase"))
      q.processAllAvailable()
      val got = s.table("cep_until_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end"))).toSeq
      // end = the LAST click (30), not the purchase — and it equals the
      // batch operator over the concatenation
      assert(got == Seq((1L, 10L, 30L)))
      val batch = graft.ops.Cep.patternMatchesUntil(
        Seq((1L, 10L, 1L, "click"), (1L, 20L, 2L, "click"),
          (1L, 30L, 3L, "click"), (1L, 40L, 4L, "purchase"))
          .toDF("k", "tms", "oid", "ty"),
        col("k"), col("tms"), col("oid"), col("ty"), pat, "purchase", 1000)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("optional stage skipped across a micro-batch boundary") {
    val pat = Seq(("view", 1, 1), ("click", 0, Int.MaxValue),
      ("purchase", 1, 1))
    // view in batch 1, purchase in batch 2 with NO click ever — the skip
    // must happen from stored state
    val b1 = Seq(CepEvent(1, 10, 1, "view"))
    val b2 = Seq(CepEvent(1, 20, 2, "purchase"))
    val got = runTimes(Seq(b1, b2), pat, 1000)
    assert(got == Seq((1L, 10L, 20L)))
    assert(got == batchTimes(b1 ++ b2, pat, 1000))
    // and with the loop entered in batch 1, the boundary still completes
    val c1 = Seq(CepEvent(2, 10, 1, "view"), CepEvent(2, 20, 2, "click"))
    val c2 = Seq(CepEvent(2, 30, 3, "purchase"))
    val got2 = runTimes(Seq(c1, c2), pat, 1000)
    assert(got2 == Seq((2L, 10L, 30L)))
    assert(got2 == batchTimes(c1 ++ c2, pat, 1000))
  }

  test("quantified fixture replay: batch splits equal the batch operator") {
    val s = spark
    import s.implicits._
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batchTimes(events, timesPat, 604800000L)
    assert(expected.nonEmpty)
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runTimes(events.grouped(size).toSeq, timesPat, 604800000L)
        == expected)
    }
  }

  test("fixture replay: any batch split equals the batch operator") {
    val s = spark
    import s.implicits._
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin(vcp: _*))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batch(events)
    assert(expected.nonEmpty)
    // per-key time order holds across ANY consecutive split of the
    // time-sorted log — try two different boundaries
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(run(events.grouped(size).toSeq) == expected)
    }
  }

  // ---- predicate stages (attachWhere) / iterative conditions (attachIter) ----

  private def runWhere(batches: Seq[Seq[VEvent]],
      stages: Seq[(VEvent => Boolean, Int, Int)],
      w: Long): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[VEvent]
    val q = CepStream.attachWhere[VEvent](mem.toDS(), _.k, _.tms, _.oid,
        stages, w)
      .writeStream.format("memory").queryName("cep_whr_out")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table("cep_whr_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  test("attachWhere: predicate stages fold across micro-batches; equals the batch operator") {
    val s = spark
    import s.implicits._
    // high-value view (>50) then high-value purchase (>100), 2+ windows
    val stages = Seq(
      (((e: VEvent) => e.ty == "view" && e.v > 50.0), 1, 1),
      (((e: VEvent) => e.ty == "purchase" && e.v > 100.0), 1, 1))
    val b1 = Seq(VEvent(1, 10, 1, "view", 20.0), VEvent(1, 20, 2, "view", 80.0))
    val b2 = Seq(VEvent(1, 30, 3, "purchase", 50.0),
      VEvent(1, 40, 4, "purchase", 150.0))
    val got = runWhere(Seq(b1, b2), stages, 1000)
    assert(got == Seq((1L, 20L, 40L)))
    val want = graft.ops.Cep.patternMatchesWhere((b1 ++ b2).toDF(),
        col("k"), col("tms"), col("oid"),
        Seq(("e.ty = 'view' AND e.value > 50.0", 1, 1),
          ("e.ty = 'purchase' AND e.value > 100.0", 1, 1)),
        1000, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(got == want)
    // a quantified predicate loop (2+ qualifying views) spans batches too
    val loop = Seq(
      (((e: VEvent) => e.ty == "view" && e.v > 50.0), 2, graft.ops.Cep.Unbounded),
      (((e: VEvent) => e.ty == "purchase"), 1, 1))
    val l1 = Seq(VEvent(2, 10, 1, "view", 90.0), VEvent(2, 20, 2, "view", 5.0))
    val l2 = Seq(VEvent(2, 30, 3, "view", 70.0), VEvent(2, 40, 4, "purchase", 1.0))
    assert(runWhere(Seq(l1, l2), loop, 1000) == Seq((2L, 10L, 40L)))
  }

  test("attachSkipNext: overlapping runs advance independently across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    var runNo = 0
    def runSkip(batches: Seq[Seq[CepEvent]], w: Long): Seq[(Long, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_skip_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachSkipNext(mem.toDS(), vcp, w).writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    def batchSkip(events: Seq[CepEvent], w: Long): Seq[(Long, Long, Long)] =
      graft.ops.Cep.patternMatchesSkipNext(events.toDF(), col("k"),
          col("tms"), col("oid"), col("ty"), vcp, w)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    // two overlapping runs, both spanning a batch boundary
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "view"))
    val b2 = Seq(CepEvent(1, 30, 3, "click"), CepEvent(1, 40, 4, "purchase"))
    val all = b1 ++ b2
    val got = runSkip(Seq(b1, b2), 1000)
    assert(got == Seq((1L, 10L, 40L), (1L, 20L, 40L)))
    assert(got == batchSkip(all, 1000))
    // per-run windows: the older run times out across the boundary, the
    // younger completes (the batch operator's per-start window)
    val t1 = Seq(CepEvent(2, 10, 1, "view"), CepEvent(2, 20, 2, "view"))
    val t2 = Seq(CepEvent(2, 30, 3, "click"), CepEvent(2, 41, 4, "purchase"))
    val gotT = runSkip(Seq(t1, t2), 25)
    assert(gotT == batchSkip(t1 ++ t2, 25))
    assert(gotT == Seq((2L, 20L, 41L)))
    // fixture replay: two different splits equal the batch operator
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin(vcp: _*))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batchSkip(events, 604800000L)
    assert(expected.nonEmpty)
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runSkip(events.grouped(size).toSeq, 604800000L) == expected)
    }
  }

  test("attachSkipNext: watermark-pruned runs do not block later matches; maxActiveRuns evicts oldest") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    var runNo = 100
    def runSkipCap(batches: Seq[Seq[CepEvent]], w: Long,
        cap: Int): Seq[(Long, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_skipcap_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachSkipNext(mem.toDS(), vcp, w,
          maxActiveRuns = cap).writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    // a key going SILENT while other keys advance the watermark: key 1's
    // runs time out (event-time timeout prunes, state row removed), then
    // the key returns and a FRESH run still matches — pruning never
    // loses a live run, and matches equal the batch operator throughout
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(9, 12, 2, "view"))
    val b2 = Seq(CepEvent(9, 500, 3, "view")) // advances watermark past 1's window
    val b3 = Seq(CepEvent(1, 600, 4, "view"), CepEvent(1, 610, 5, "click"),
      CepEvent(1, 620, 6, "purchase"))
    assert(runSkipCap(Seq(b1, b2, b3), 100, cap = 0) ==
      Seq((1L, 600L, 620L)))
    // maxActiveRuns = 1 evicts the OLDEST run: with two in-window views,
    // only the younger run survives to match (the documented loss)
    val c1 = Seq(CepEvent(2, 10, 1, "view"), CepEvent(2, 20, 2, "view"))
    val c2 = Seq(CepEvent(2, 30, 3, "click"), CepEvent(2, 40, 4, "purchase"))
    assert(runSkipCap(Seq(c1, c2), 1000, cap = 1) == Seq((2L, 20L, 40L)))
    // the same drive uncapped keeps both overlapping matches
    assert(runSkipCap(Seq(c1, c2), 1000, cap = 0) ==
      Seq((2L, 10L, 40L), (2L, 20L, 40L)))
    // CROSS-KEY SKEW inside the watermark delay: key 4's event times lag
    // key 3's by more than the window — with the documented delay sized
    // to the skew, 4's rows are not late and its runs survive to match
    // (the default delay = the 60 s window would still drop them here:
    // the skew is 120 s — the delay contract on attachSkipNext)
    def runSkipDelay(batches: Seq[Seq[CepEvent]], w: Long,
        delay: String): Seq[(Long, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_skipdelay_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachSkipNext(mem.toDS(), vcp, w, delay = delay)
        .writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    val d1 = Seq(CepEvent(3, 600000, 1, "view"), CepEvent(4, 480000, 2, "view"))
    val d2 = Seq(CepEvent(4, 480010, 3, "click"), CepEvent(3, 600010, 4, "click"))
    val d3 = Seq(CepEvent(4, 480020, 5, "purchase"),
      CepEvent(3, 600020, 6, "purchase"))
    val gotD = runSkipDelay(Seq(d1, d2, d3), 60000, "600 seconds")
    val wantD = graft.ops.Cep.patternMatchesSkipNext((d1 ++ d2 ++ d3).toDF(),
        col("k"), col("tms"), col("oid"), col("ty"), vcp, 60000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(identity).toSeq
    assert(gotD == wantD)
    assert(gotD == Seq((3L, 600000L, 600020L), (4L, 480000L, 480020L)))
  }

  test("attachTimesConsecutive: loop adjacency and the closed flag cross batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val pat = Seq(("view", 2, graft.ops.Cep.Unbounded), ("purchase", 1, 1))
    var runNo = 0
    def runConsec(batches: Seq[Seq[CepEvent]],
        w: Long): Seq[(Long, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_consec_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachTimesConsecutive(mem.toDS(), pat, w, Set(0))
        .writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    def batchConsec(events: Seq[CepEvent], w: Long): Seq[(Long, Long, Long)] =
      graft.ops.Cep.patternMatchesTimesConsecutive(events.toDF(), col("k"),
          col("tms"), col("oid"), col("ty"), pat, w, Set(0))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    // the closed flag crosses the boundary: views, a closing error in
    // batch 1; the batch-2 view cannot extend, the purchase completes
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 15, 2, "view"),
      CepEvent(1, 20, 3, "error"))
    val b2 = Seq(CepEvent(1, 25, 4, "view"), CepEvent(1, 30, 5, "purchase"))
    val got = runConsec(Seq(b1, b2), 1000)
    assert(got == Seq((1L, 10L, 30L)))
    assert(got == batchConsec(b1 ++ b2, 1000))
    // a break exactly at the boundary kills a below-floor run
    val c1 = Seq(CepEvent(2, 10, 1, "view"))
    val c2 = Seq(CepEvent(2, 15, 2, "error"), CepEvent(2, 20, 3, "view"),
      CepEvent(2, 25, 4, "view"), CepEvent(2, 30, 5, "purchase"))
    val gotC = runConsec(Seq(c1, c2), 1000)
    assert(gotC == Seq((2L, 20L, 30L)))
    assert(gotC == batchConsec(c1 ++ c2, 1000))
    // fixture replay: two different splits equal the batch operator
    // (UNFILTERED stream — any event can break a loop)
    val events = Envelopes.events(s, sfDir())
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batchConsec(events, 604800000L)
    assert(expected.nonEmpty)
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runConsec(events.grouped(size).toSeq, 604800000L) == expected)
    }
  }

  test("attachSkipTo: the rewind buffer crosses micro-batch boundaries") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    var runNo = 0
    def runSkipTo(batches: Seq[Seq[CepEvent]], w: Long,
        k: Int): Seq[(Long, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_skipto_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachSkipTo(mem.toDS(), vcp, w, k).writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    def batchSkipTo(events: Seq[CepEvent], w: Long,
        k: Int): Seq[(Long, Long, Long)] =
      graft.ops.Cep.patternMatchesSkipTo(events.toDF(), col("k"),
          col("tms"), col("oid"), col("ty"), vcp, w, k)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
    // the click buffered in batch 1 is replayed when the match completes
    // in batch 2, and the rewound run completes in batch 3 — the buffer
    // (and mid-replay partial) persist in keyed state
    val b1 = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
    val b2 = Seq(CepEvent(1, 25, 3, "view"), CepEvent(1, 30, 4, "purchase"))
    val b3 = Seq(CepEvent(1, 35, 5, "click"), CepEvent(1, 40, 6, "purchase"))
    val all = b1 ++ b2 ++ b3
    val got = runSkipTo(Seq(b1, b2, b3), 1000, 1)
    assert(got == Seq((1L, 10L, 30L), (1L, 25L, 40L)))
    assert(got == batchSkipTo(all, 1000, 1))
    // fixture replay: two different splits equal the batch operator
    val events = Envelopes.events(s, sfDir())
      .filter(col("event_type").isin(vcp: _*))
      .select(col("user_id").as("k"), expr("unix_millis(ts)").as("tms"),
        col("event_id").as("oid"), col("event_type").as("ty"))
      .as[CepEvent].collect().toSeq.sortBy(e => (e.tms, e.oid))
    val expected = batchSkipTo(events, 604800000L, 1)
    assert(expected.nonEmpty)
    for (parts <- Seq(3, 7)) {
      val size = math.max(1, (events.length + parts - 1) / parts)
      assert(runSkipTo(events.grouped(size).toSeq, 604800000L, 1) == expected)
    }
  }

  test("attachSelect: the stage-event buffer and match counter cross micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[CepEvent]
    val q = CepStream.attachSelect(mem.toDS(), vcp, 1000).writeStream
      .format("memory").queryName("cep_sel_out").outputMode("append").start()
    try {
      // match 1's view+click land in batch 1, its purchase in batch 2 —
      // the emitted payload must still include ALL THREE stage events
      mem.addData(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"))
      q.processAllAvailable()
      mem.addData(CepEvent(1, 30, 3, "purchase"),
        CepEvent(1, 40, 4, "view"))
      q.processAllAvailable()
      mem.addData(CepEvent(1, 50, 5, "click"), CepEvent(1, 60, 6, "purchase"))
      q.processAllAvailable()
      val got = s.table("cep_sel_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Int]("match_n"),
          r.getAs[Int]("stage_n"), r.getAs[Long]("ev_tms"),
          r.getAs[Long]("ev_oid")))
        .sortBy(identity).toSeq
      assert(got == Seq(
        (1L, 1, 1, 10L, 1L), (1L, 1, 2, 20L, 2L), (1L, 1, 3, 30L, 3L),
        (1L, 2, 1, 40L, 4L), (1L, 2, 2, 50L, 5L), (1L, 2, 3, 60L, 6L)))
      // equals the batch select operator over the concatenation
      val all = Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"),
        CepEvent(1, 30, 3, "purchase"), CepEvent(1, 40, 4, "view"),
        CepEvent(1, 50, 5, "click"), CepEvent(1, 60, 6, "purchase"))
      val want = graft.ops.Cep.patternMatchesSelect(all.toDF(), col("k"),
          col("tms"), col("oid"), col("ty"), vcp, 1000)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4)))
        .sortBy(identity).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("attachIter: the first.* capture crosses a micro-batch boundary") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // purchase worth more than double the OPENING view's value — the view
    // lands in batch 1, the qualifying purchase in batch 2, so the capture
    // must survive in keyed state (CepIterState.f0)
    val stages = Seq(
      (((e: VEvent, _: VEvent) => e.ty == "view"), 1, 1),
      (((e: VEvent, f: VEvent) => e.ty == "purchase" && e.v > 2 * f.v), 1, 1))
    val mem = MemoryStream[VEvent]
    val q = CepStream.attachIter[VEvent](mem.toDS(), _.k, _.tms, _.oid,
        stages, 1000)
      .writeStream.format("memory").queryName("cep_itr_out")
      .outputMode("append").start()
    try {
      mem.addData(VEvent(1, 10, 1, "view", 30.0),
        VEvent(2, 15, 2, "view", 10.0))
      q.processAllAvailable()
      mem.addData(VEvent(1, 20, 3, "purchase", 50.0),
        VEvent(1, 30, 4, "purchase", 70.0),
        VEvent(2, 25, 5, "purchase", 25.0))
      q.processAllAvailable()
      val got = s.table("cep_itr_out").collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
      assert(got == Seq((1L, 10L, 30L), (2L, 15L, 25L)))
      // equals the batch iterative operator over the concatenation
      val all = Seq(VEvent(1, 10, 1, "view", 30.0),
        VEvent(2, 15, 2, "view", 10.0), VEvent(1, 20, 3, "purchase", 50.0),
        VEvent(1, 30, 4, "purchase", 70.0), VEvent(2, 25, 5, "purchase", 25.0))
      val want = graft.ops.Cep.patternMatchesIter(all.toDF(), col("k"),
          col("tms"), col("oid"),
          Seq(("e.ty = 'view'", 1, 1),
            ("e.ty = 'purchase' AND e.value > 2 * first.value", 1, 1)),
          1000, payload = Seq("ty" -> col("ty"), "value" -> col("v")))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(identity).toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("attachGroup / attachTimesNfa: group unroll and branch family cross batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    var runNo = 500
    def run(batches: Seq[Seq[CepEvent]])(
        mk: org.apache.spark.sql.Dataset[CepEvent] =>
          org.apache.spark.sql.Dataset[CepStream.CepMatch]) = {
      runNo += 1
      val tbl = s"cep_gn_out_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = mk(mem.toDS()).writeStream
        .format("memory").queryName(tbl).outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
            r.getAs[Long]("match_end")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    // group (view click) x 2 spanning three batches = the batch operator
    val gb = Seq(
      Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click")),
      Seq(CepEvent(1, 30, 3, "view")),
      Seq(CepEvent(1, 40, 4, "click")))
    assert(run(gb)(ds => CepStream.attachGroup(ds, Seq("view", "click"),
      2, 1000)) == Seq((1L, 10L, 40L)))
    // NFA: the family opened in batch 1 completes via the skip branch in
    // batch 2 (the greedy stream would park the click in the optional
    // slot and emit nothing)
    val pat = Seq(("view", 1, 1), ("click", 0, 1), ("click", 1, 1))
    val nb = Seq(
      Seq(CepEvent(1, 10, 1, "view")),
      Seq(CepEvent(1, 20, 2, "click")))
    assert(run(nb)(ds => CepStream.attachTimesNfa(ds, pat, 1000)) ==
      Seq((1L, 10L, 20L)))
    assert(run(nb)(ds => CepStream.attachTimes(ds, pat, 1000)).isEmpty)
    // timeout across the boundary, then a fresh family matches
    val tb = Seq(
      Seq(CepEvent(2, 10, 1, "view")),
      Seq(CepEvent(2, 2000, 2, "view"), CepEvent(2, 2010, 3, "click")))
    assert(run(tb)(ds => CepStream.attachTimesNfa(ds, pat, 1000)) ==
      Seq((2L, 2000L, 2010L)))
  }
}

/** Payload-carrying event for the attachWhere/attachIter specs (top level:
  * product encoders need a stable, outer-free class). */
final case class VEvent(k: Long, tms: Long, oid: Long, ty: String, v: Double)

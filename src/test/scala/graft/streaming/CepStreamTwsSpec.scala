package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.CepStream.CepEvent

/** CEP on the modern state API: the `transformWithState` twins of
  * attach/attachNeg over the RocksDB provider must reproduce the
  * `flatMapGroupsWithState` forms record for record across micro-batches
  * (the IsNewFixTws discipline), and the CepStream entry points must
  * DISPATCH to them under the engine's keyed-state policy (StateImpl). */
class CepStreamTwsSpec extends SparkSpec {

  private val rocksdb = StateImpl.RocksDbProvider
  private val provider = "spark.sql.streaming.stateStore.providerClass"
  private var runNo = 0

  private def withProvider[A](body: => A): A = {
    val prev = spark.conf.getOption(provider)
    spark.conf.set(provider, rocksdb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(provider, v)
      case None => spark.conf.unset(provider)
    }
  }

  private def drive(batches: Seq[Seq[CepEvent]])(
      mk: org.apache.spark.sql.Dataset[CepEvent] =>
        org.apache.spark.sql.Dataset[CepStream.CepMatch])
      : Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    runNo += 1
    val tbl = s"cep_tws_out_$runNo"
    val mem = MemoryStream[CepEvent]
    val q = mk(mem.toDS()).writeStream
      .format("memory").queryName(tbl).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cep_tws_ckpt").toString)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      s.table(tbl).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[Long]("match_start"),
          r.getAs[Long]("match_end")))
        .sortBy(identity).toSeq
    } finally q.stop()
  }

  private val vcp = Seq("view", "click", "purchase")

  test("attach: tws twin ≡ fMGWS record for record across batches (incl. timeout reopen)") {
    // partial spans the boundary; a second run times out mid-stream
    val batches = Seq(
      Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click"),
        CepEvent(2, 10, 3, "view")),
      Seq(CepEvent(1, 30, 4, "purchase"), // completes across the boundary
        CepEvent(2, 2000, 5, "click")), // key 2's partial timed out
      Seq(CepEvent(2, 2010, 6, "view"), CepEvent(2, 2020, 7, "click"),
        CepEvent(2, 2030, 8, "purchase")))
    withProvider {
      val tws = drive(batches)(ds => CepStreamTws.attach(ds, vcp, 1000))
      assert(tws == Seq((1L, 10L, 30L), (2L, 2010L, 2030L)))
      // the fMGWS form, forced via the dispatcher override
      spark.conf.set("spark.graft.state.impl", "fmgws")
      try assert(tws == drive(batches)(ds => CepStream.attach(ds, vcp, 1000)))
      finally spark.conf.unset("spark.graft.state.impl")
      // and the AUTO dispatch (RocksDB provider) lands on the tws twin
      // with identical output
      assert(tws == drive(batches)(ds => CepStream.attach(ds, vcp, 1000)))
    }
  }

  test("attachNeg: tws timers ≡ fMGWS event-time timeout (watch emit, ban kill, stale timer)") {
    // key 1: watch opens (view click), watermark later passes the window
    //   end with the key SILENT -> the timer emits the pending match
    // key 2: watch opens, then a banned refund arrives -> killed; the
    //   superseded timer must NOT emit (tws deletes it; fMGWS's stale
    //   timeout hits the st-guard)
    // key 9: watermark mover
    val batches = Seq(
      Seq(CepEvent(1, 100, 1, "view"), CepEvent(1, 110, 2, "click"),
        CepEvent(2, 100, 3, "view"), CepEvent(2, 120, 4, "click")),
      Seq(CepEvent(2, 130, 5, "refund")),
      Seq(CepEvent(9, 5000, 6, "view"))) // watermark past both windows
    def run(f: org.apache.spark.sql.Dataset[CepEvent] =>
        org.apache.spark.sql.Dataset[CepStream.CepMatch]) = drive(batches)(f)
    withProvider {
      val want = Seq((1L, 100L, 110L))
      val tws = run(ds => CepStream.attachNeg(ds, Seq("view", "click"),
        1000, notAfter = Seq("refund"))) // AUTO -> tws under RocksDB
      assert(tws == want)
      spark.conf.set("spark.graft.state.impl", "fmgws")
      try assert(want == run(ds => CepStream.attachNeg(ds,
        Seq("view", "click"), 1000, notAfter = Seq("refund"))))
      finally spark.conf.unset("spark.graft.state.impl")
    }
  }

  test("attachNeg: notBetween kill and cross-batch partial parity on both APIs") {
    val batches = Seq(
      Seq(CepEvent(1, 10, 1, "view"), CepEvent(2, 10, 2, "view")),
      Seq(CepEvent(1, 20, 3, "spam"), // kills key 1's partial
        CepEvent(2, 20, 4, "click")),
      Seq(CepEvent(1, 30, 5, "click"), // no live partial -> no match
        CepEvent(2, 30, 6, "purchase")))
    def run(f: org.apache.spark.sql.Dataset[CepEvent] =>
        org.apache.spark.sql.Dataset[CepStream.CepMatch]) = drive(batches)(f)
    withProvider {
      val want = Seq((2L, 10L, 30L))
      assert(run(ds => CepStream.attachNeg(ds, vcp, 1000,
        notBetween = Map(1 -> Seq("spam")))) == want) // AUTO -> tws
      spark.conf.set("spark.graft.state.impl", "fmgws")
      try assert(run(ds => CepStream.attachNeg(ds, vcp, 1000,
        notBetween = Map(1 -> Seq("spam")))) == want)
      finally spark.conf.unset("spark.graft.state.impl")
    }
  }

  test("round-14 twins: every remaining CEP stream form ≡ fMGWS record for record") {
    import CepStream.CepMatch
    // loops (view x2), strictness, skips, a cross-batch partial, a second
    // key with noise between stages, and a far-future batch that moves the
    // watermark for the skip-next timer path
    val batches = Seq(
      Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "view"),
        CepEvent(1, 30, 3, "click"), CepEvent(2, 10, 4, "view")),
      Seq(CepEvent(1, 40, 5, "purchase"), CepEvent(2, 15, 6, "spam"),
        CepEvent(2, 20, 7, "click")),
      Seq(CepEvent(2, 2000, 8, "view"), CepEvent(2, 2010, 9, "click"),
        CepEvent(2, 2020, 10, "purchase")))
    val loopPat = Seq(("view", 1, 2), ("click", 1, 1))
    val forms: Seq[(String,
        org.apache.spark.sql.Dataset[CepEvent] =>
          org.apache.spark.sql.Dataset[CepMatch])] = Seq(
      "times" -> (ds => CepStream.attachTimes(ds,
        loopPat :+ (("purchase", 1, 1)), 1000)),
      "next" -> (ds => CepStream.attachNext(ds, vcp, 1000,
        nextStages = Set(2))),
      "consec" -> (ds => CepStream.attachTimesConsecutive(ds, loopPat,
        1000, consecutive = Set(0))),
      "where" -> (ds => CepStream.attachWhere[CepEvent](ds, _.k, _.tms,
        _.oid,
        Seq((((e: CepEvent) => e.ty == "view"), 1, 2),
          (((e: CepEvent) => e.ty == "click"), 1, 1)), 1000)),
      "iter" -> (ds => CepStream.attachIter[CepEvent](ds, _.k, _.tms,
        _.oid,
        Seq((((e: CepEvent, _: CepEvent) => e.ty == "view"), 1, 2),
          (((e: CepEvent, f: CepEvent) =>
            e.ty == "click" && e.tms >= f.tms), 1, 1)), 1000)),
      "skipto" -> (ds => CepStream.attachSkipTo(ds, vcp, 1000, skipTo = 1)),
      "nfa" -> (ds => CepStream.attachTimesNfa(ds, loopPat, 1000)),
      "until" -> (ds => CepStream.attachUntil(ds,
        Seq(("view", 1, 2), ("click", 1, Int.MaxValue)), "purchase", 1000)),
      "skipnext" -> (ds => CepStream.attachSkipNext(ds, vcp, 1000)))
    withProvider {
      forms.foreach { case (name, f) =>
        val tws = drive(batches)(f) // AUTO -> tws under RocksDB
        assert(tws.nonEmpty, s"form $name emitted nothing — fixture too weak")
        spark.conf.set("spark.graft.state.impl", "fmgws")
        val fm =
          try drive(batches)(f)
          finally spark.conf.unset("spark.graft.state.impl")
        assert(tws == fm, s"form $name diverged:\n  tws  $tws\n  fmgws $fm")
      }
    }
  }

  test("late rows: the event-time twins drop sub-watermark rows exactly like fMGWS") {
    // batch 1 opens a partial for key 1 and moves the GLOBAL watermark far
    // past it via key 9; batch 2 delivers key 1's completing event LATE
    // (tms < watermark). fMGWS's EventTimeTimeout drops the late row AND
    // prunes the window-closed run — no match. The tws twins must agree:
    // a twin that fed the late row to the stepper would emit (8000, 8400)
    // during the step, BEFORE its own watermark pruning ran.
    val batches = Seq(
      Seq(CepEvent(1, 8000, 1, "view"), CepEvent(9, 20000, 2, "view")),
      Seq(CepEvent(1, 8400, 3, "click")),
      Seq(CepEvent(9, 30000, 4, "view"))) // flush timers
    def runBoth(name: String,
        f: org.apache.spark.sql.Dataset[CepEvent] =>
          org.apache.spark.sql.Dataset[CepStream.CepMatch]): Unit = {
      val tws = drive(batches)(f) // AUTO -> tws under RocksDB
      spark.conf.set("spark.graft.state.impl", "fmgws")
      val fm = try drive(batches)(f)
        finally spark.conf.unset("spark.graft.state.impl")
      assert(tws == fm, s"$name late-row divergence:\n  tws  $tws\n  fmgws $fm")
    }
    withProvider {
      runBoth("skipnext",
        ds => CepStream.attachSkipNext(ds, Seq("view", "click"), 1000))
      runBoth("neg",
        ds => CepStream.attachNeg(ds, Seq("view", "click"), 1000,
          notAfter = Seq("refund")))
    }
  }

  test("attachSelect tws twin: per-stage payload parity across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val batches = Seq(
      Seq(CepEvent(1, 10, 1, "view"), CepEvent(1, 20, 2, "click")),
      Seq(CepEvent(1, 30, 3, "purchase"), CepEvent(2, 10, 4, "view")),
      Seq(CepEvent(2, 20, 5, "click"), CepEvent(2, 30, 6, "purchase")))
    def driveSel(): Seq[(Long, Int, Int, Long, Long)] = {
      runNo += 1
      val tbl = s"cep_tws_sel_$runNo"
      val mem = MemoryStream[CepEvent]
      val q = CepStream.attachSelect(mem.toDS(), vcp, 1000).writeStream
        .format("memory").queryName(tbl).outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("cep_tws_sel").toString)
        .start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
        s.table(tbl).collect()
          .map(r => (r.getAs[Long]("k"), r.getAs[Int]("match_n"),
            r.getAs[Int]("stage_n"), r.getAs[Long]("ev_tms"),
            r.getAs[Long]("ev_oid")))
          .sortBy(identity).toSeq
      } finally q.stop()
    }
    withProvider {
      val tws = driveSel() // AUTO -> tws under RocksDB
      assert(tws.nonEmpty)
      spark.conf.set("spark.graft.state.impl", "fmgws")
      val fm = try driveSel()
        finally spark.conf.unset("spark.graft.state.impl")
      assert(tws == fm, s"select diverged:\n  tws  $tws\n  fmgws $fm")
    }
  }
}

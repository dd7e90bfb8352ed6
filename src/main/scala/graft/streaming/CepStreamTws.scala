package graft.streaming

import scala.collection.mutable.ListBuffer
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import CepStream.{CepEvent, CepMatch, CepState, CepNegState}

/** CEP on the MODERN state API — `transformWithState` twins of
  * [[CepStream.attach]] and [[CepStream.attachNeg]] (the r12 verdict's
  * item 4: the engine's keyed-state dispatcher made tws the default under
  * RocksDB for IsNewFix/TtlState while the CEP stream surface stayed
  * fMGWS-only). The automaton semantics are SHARED CODE, not twins:
  * [[CepStream.runBasic]] is the one step loop of the basic form, and the
  * negation form runs the same [[graft.ops.Cep.NegStepper]] the fMGWS
  * group and the batch operator run — only the state-API plumbing (named
  * `ValueState`, explicit timers) differs, pinned record-for-record equal
  * by CepStreamTwsSpec (the [[IsNewFixTws]] discipline).
  *
  * Timer semantics note: `flatMapGroupsWithState`'s
  * `setTimeoutTimestamp` REPLACES the key's single timeout, while
  * `transformWithState` timers ACCUMULATE — a stale timer from a
  * superseded watch would fire early and emit a live watch whose window
  * has not provably closed. The negation processor therefore clears the
  * key's registered timers (`listTimers`/`deleteTimer`) before
  * re-arming, restoring the single-deadline semantics.
  *
  * `transformWithState` requires the RocksDB state-store provider;
  * [[CepStream.attach]]/[[CepStream.attachNeg]] dispatch here exactly
  * when [[StateImpl.useTws]] says so (AUTO = the session's provider). */
object CepStreamTws {

  /** [[CepStream.matchGroup]] on named ValueState. */
  final class Processor(pattern: IndexedSeq[String], withinMs: Long)
      extends StatefulProcessor[Long, CepEvent, CepMatch] {
    @transient private var st: ValueState[CepState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CepState]("cep_state",
        Encoders.product[CepState], TTLConfig.NONE)

    override def handleInputRows(k: Long, rows: Iterator[CepEvent],
        timerValues: TimerValues): Iterator[CepMatch] = {
      val out = ListBuffer.empty[CepMatch]
      val s = CepStream.runBasic(pattern, withinMs, k, rows,
        if (st.exists()) st.get() else CepState(0, 0L), out)
      st.update(s)
      out.iterator
    }
  }

  /** [[CepStream.matchGroupNeg]] on named ValueState + explicit
    * event-time timers. */
  final class NegProcessor(pattern: IndexedSeq[String], withinMs: Long,
      notBetween: Map[Int, Set[String]], notAfter: Set[String])
      extends StatefulProcessor[Long, CepEvent, CepMatch] {
    @transient private var st: ValueState[CepNegState] = _
    private val watch = pattern.length

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CepNegState]("cep_neg_state",
        Encoders.product[CepNegState], TTLConfig.NONE)

    override def handleInputRows(k: Long, rows: Iterator[CepEvent],
        timerValues: TimerValues): Iterator[CepMatch] = {
      val out = ListBuffer.empty[CepMatch]
      var s = if (st.exists()) st.get() else CepNegState(0, 0L, 0L)
      val sorted = rows.toSeq.sortBy(e => (e.tms, e.oid, e.ty))
      val stepper = new graft.ops.Cep.NegStepper(pattern, withinMs,
        notBetween, notAfter)
      sorted.foreach { e =>
        val next = stepper.step(s.st, s.t0, s.te, e.tms, e.ty,
          (st0, en) => out += CepMatch(k, st0, en))
        s = CepNegState(next._1, next._2, next._3)
      }
      // single-deadline semantics (see object doc): drop superseded timers
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (s.st == watch &&
          timerValues.getCurrentWatermarkInMs() >= s.t0 + withinMs) {
        // the watermark already proves the window closed banned-free —
        // emit inline, exactly the fMGWS branch
        out += CepMatch(k, s.t0, s.te)
        st.clear()
      } else {
        st.update(s)
        if (s.st == watch) getHandle.registerTimer(s.t0 + withinMs)
      }
      out.iterator
    }

    override def handleExpiredTimer(k: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[CepMatch] = {
      // silence past the deadline: the banned event never came. Timers
      // are cleared on every input batch, so a firing timer is the LIVE
      // watch's own deadline — but keep the fMGWS stale-guard shape
      // anyway (emit only a live watch; drop empty state, keep partials).
      if (st.exists()) {
        val s = st.get()
        if (s.st == watch) {
          st.clear()
          return Iterator.single(CepMatch(k, s.t0, s.te))
        }
        if (s.st == 0) st.clear()
      }
      Iterator.empty
    }
  }

  /** [[CepStream.attach]]'s tws twin — same contract, named state. */
  def attach(ds: Dataset[CepEvent], pattern: Seq[String],
      withinMs: Long): Dataset[CepMatch] = {
    require(pattern.nonEmpty, "pattern must not be empty")
    require(withinMs > 0, s"withinMs must be > 0, got $withinMs")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .transformWithState(new Processor(pattern.toIndexedSeq, withinMs),
        TimeMode.None(), OutputMode.Append())
  }

  /** [[CepStream.attachNeg]]'s tws twin: the caller (attachNeg's
    * dispatch) has already attached the watermark; event-time timers
    * stand in for the fMGWS event-time timeout. */
  private[streaming] def attachNegWatermarked(ds: Dataset[CepEvent],
      pattern: Seq[String], withinMs: Long,
      notBetween: Map[Int, Set[String]],
      notAfter: Set[String]): Dataset[CepMatch] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .transformWithState(
        new NegProcessor(pattern.toIndexedSeq, withinMs, notBetween, notAfter),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

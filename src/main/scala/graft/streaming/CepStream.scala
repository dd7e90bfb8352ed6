package graft.streaming

import scala.collection.mutable.ListBuffer
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of [[graft.ops.Cep.patternMatches]] — the Flink-CEP
  * `followedBy ... within` automaton as `flatMapGroupsWithState` keyed
  * state, exactly the (stage, start-ts) pair Flink's NFA holds per key for
  * this pattern class.
  *
  * Contract: events must arrive per-key in non-decreasing event-time order
  * ACROSS micro-batches (the upstream watermark's job — same contract as
  * [[IsNewFix]]); WITHIN a batch any order is fine, the group buffers and
  * sorts by (tms, oid, ty) before folding. Under that contract the
  * concatenation of per-batch folds IS the batch fold, so emitted matches
  * equal the batch operator on a complete replay regardless of where batch
  * boundaries fall (`CepStreamSpec`).
  *
  * Scale: state is two longs per key behind the key hash shuffle; per-batch
  * group memory is the key's pattern-events in THAT batch only (the batch
  * twin holds the key's full history instead — the streaming form is the
  * cheaper one at any horizon).
  */
object CepStream {

  final case class CepEvent(k: Long, tms: Long, oid: Long, ty: String)
  final case class CepMatch(k: Long, match_start: Long, match_end: Long)
  /** st = stages matched so far; t0 = partial-match start (0 when st = 0). */
  final case class CepState(st: Int, t0: Long)

  /** One micro-batch group: sort, run the automaton from stored state,
    * store the final (st, t0), emit completed matches. */
  def matchGroup(pattern: IndexedSeq[String], withinMs: Long)(
      k: Long, events: Iterator[CepEvent],
      state: GroupState[CepState]): Iterator[CepMatch] = {
    val sorted = events.toSeq.sortBy(e => (e.tms, e.oid, e.ty))
    var s = state.getOption.getOrElse(CepState(0, 0L))
    val out = ListBuffer.empty[CepMatch]
    sorted.foreach { e =>
      if (s.st > 0 && e.tms - s.t0 > withinMs) s = CepState(0, 0L)
      if (e.ty == pattern(s.st)) {
        val start = if (s.st == 0) e.tms else s.t0
        if (s.st == pattern.length - 1) {
          out += CepMatch(k, start, e.tms); s = CepState(0, 0L)
        } else s = CepState(s.st + 1, start)
      }
    }
    state.update(s)
    out.iterator
  }

  /** Attach the automaton to a keyed event stream. Pre-filter to the
    * pattern's types before calling (the batch twin does; non-pattern
    * events never change state, they only cost shuffle). */
  def attach(ds: Dataset[CepEvent], pattern: Seq[String],
      withinMs: Long): Dataset[CepMatch] = {
    require(pattern.nonEmpty, "pattern must not be empty")
    // batch-twin parity at the API boundary: Cep.patternMatches rejects a
    // non-positive window; here it would silently abandon every
    // multi-stage partial instead
    require(withinMs > 0, s"withinMs must be > 0, got $withinMs")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        matchGroup(pattern.toIndexedSeq, withinMs))
  }
}

package graft.streaming

import scala.concurrent.duration.FiniteDuration
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** J7 on the MODERN state API: the same idle-state-TTL join as
  * [[TtlState.ttlJoin]], expressed as a Spark 4 `StatefulProcessor` for
  * `KeyValueGroupedDataset.transformWithState` — the forward path for the
  * reference's `setIdleStateRetention` semantics
  * (`DwdTradeOrderDetail.java:32`, `DwdTradeOrderPaySucDetail.java:31`).
  *
  * Where `flatMapGroupsWithState` folds both sides' buffers into ONE opaque
  * state tuple that is deserialized and rewritten wholesale on every touch,
  * this processor holds each side in a named `ListState` — `appendValue` is
  * an O(1) RocksDB append, so a touch costs the new row, not the whole
  * buffer (the asymptotic win that matters when a hot key accumulates
  * thousands of buffered rows within its TTL window). Eviction uses a real
  * processing-time timer: each touch deletes the key's previous deadline and
  * arms a new one (at most one timer is live per key by construction), and
  * the expiry callback clears both lists — the literal shape of Flink's
  * per-key idle-state timer.
  *
  * Kept alongside [[TtlState.ttlJoin]] deliberately: fMGWS runs on every
  * state-store provider; `transformWithState` requires RocksDB, which
  * `TtlStateTwsSpec` configures per query. The spec pins pair-for-pair
  * parity between the two implementations on the same paced stream.
  */
object TtlStateTws {

  /** Both join sides tagged into one keyed stream — the same union shape
    * [[TtlState.ttlJoin]] feeds fMGWS. */
  final class Processor[K, L, R](ttlMs: Long, lEnc: Encoder[L], rEnc: Encoder[R])
      extends StatefulProcessor[K, (K, Option[L], Option[R]), (K, L, R)] {
    @transient private var lefts: ListState[L] = _
    @transient private var rights: ListState[R] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // TTL is enforced by the explicit timer (refresh-on-touch), not by
      // per-state TTLConfig: state TTL expires entries a fixed time after
      // their WRITE, which would age out early rows of a still-active key —
      // not the reference's idle-time contract.
      lefts = getHandle.getListState[L]("lefts", lEnc, TTLConfig.NONE)
      rights = getHandle.getListState[R]("rights", rEnc, TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[(K, Option[L], Option[R])],
        timerValues: TimerValues): Iterator[(K, L, R)] = {
      val out = List.newBuilder[(K, L, R)]
      rows.foreach {
        case (_, Some(l), _) =>
          rights.get().foreach(r => out += ((key, l, r)))
          lefts.appendValue(l)
        case (_, _, Some(r)) =>
          lefts.get().foreach(l => out += ((key, l, r)))
          rights.appendValue(r)
        case _ => ()
      }
      // every touch refreshes the idle TTL: drop the previous deadline and
      // arm a new one ttl from now
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs + ttlMs)
      out.result().iterator
    }

    override def handleExpiredTimer(key: K, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[(K, L, R)] = {
      // idle past TTL: drop the key's buffers; a later probe finds nothing
      lefts.clear()
      rights.clear()
      Iterator.empty
    }
  }

  /** Streaming inner equi-join with idle-state TTL — same contract as
    * [[TtlState.ttlJoin]], same implicit bundle, modern state backend. */
  def ttlJoin[K, L, R](left: Dataset[(K, L)], right: Dataset[(K, R)],
      ttl: FiniteDuration)(implicit
      kEnc: Encoder[K], lEnc: Encoder[L], rEnc: Encoder[R],
      tagEnc: Encoder[(K, Option[L], Option[R])],
      outEnc: Encoder[(K, L, R)]): Dataset[(K, L, R)] = {
    val tagged = left.map { case (k, l) => (k, Option(l), Option.empty[R]) }
      .union(right.map { case (k, r) => (k, Option.empty[L], Option(r)) })
    tagged.groupByKey(_._1)
      .transformWithState(new Processor[K, L, R](ttl.toMillis, lEnc, rEnc),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
